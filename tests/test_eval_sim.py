"""Truth-based integration test: simulate AS events, run the full pipeline,
score against ground truth.

This is the native equivalent of the reference's simulation experiment
(``exps/1-dm-sim``): events with known linear coordinates are injected,
reads are simulated for two conditions (ΔPSI ≈ 0.5 signal), and the called
quant-remap output must recover them.

Detectability contract: ES (novel skip junction at exon boundaries) and IR
(coverage through the intron) are detectable; A3/A5 at arbitrary intronic
offsets are NOT representable as graph junctions — the reference pipeline
cannot detect those either (its IL/OL offset histograms are parsed but
never consumed, ``call.py:25-69`` / SURVEY §7.3), so they are excluded
from the recall assertion.
"""

import sys
from pathlib import Path

import pytest

from conftest import REFERENCE, run_cli

EXAMPLE = REFERENCE / "example"


@pytest.fixture(scope="session")
def sim_scores(tmp_path_factory, example_graph):
    wd = tmp_path_factory.mktemp("sim")
    prefix = wd / "sim"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "sim",
         str(EXAMPLE / "4.fa"), str(EXAMPLE / "4.gtf"),
         "-o", str(prefix), "-n", "8", "-r", "30"],
    )
    for cond in ("c1", "c2"):
        run_cli(
            [sys.executable, "-m", "pantas_tpu", "map", str(example_graph),
             f"{prefix}_{cond}_1.fq", f"{prefix}_{cond}_2.fq"],
            out_path=wd / f"{cond}.gaf",
        )
        run_cli(
            [sys.executable, "-m", "pantas_tpu", "augment",
             str(wd / f"{cond}.gaf"), str(example_graph)],
            out_path=wd / f"{cond}_aug.gfa",
        )
        run_cli(
            [sys.executable, "-m", "pantas_tpu", "call", "--rca", "3", "--novel",
             "--minintronsize", "20", str(wd / f"{cond}_aug.gfa"),
             str(EXAMPLE / "4.gtf")],
            out_path=wd / f"{cond}_events.csv",
            hashseed="0",
        )
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "quant", "-a",
         "--c1", str(wd / "c1_events.csv"), "--c2", str(wd / "c2_events.csv")],
        out_path=wd / "quant.csv",
    )
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "remap", str(wd / "quant.csv"),
         str(EXAMPLE / "4.gtf"), "-i", "20"],
        out_path=wd / "remap.csv",
    )

    from pantas_tpu.eval.compare import parse_quant_remap, parse_truth, score

    truth = parse_truth(f"{prefix}_truth.csv")
    called = parse_quant_remap(str(wd / "remap.csv"))
    return truth, score(truth, called, relax=5, min_dpsi=0.1)


def test_sim_recovers_es_and_ir(sim_scores):
    truth, results = sim_scores
    assert results["ES"]["tp"] == sum(1 for t in truth if t.etype == "ES")
    assert results["IR"]["tp"] == sum(1 for t in truth if t.etype == "IR")
    assert results["ES"]["precision"] == 1.0
    assert results["IR"]["precision"] == 1.0


def test_sim_no_false_positives_at_dpsi_cut(sim_scores):
    _, results = sim_scores
    assert results["ALL"]["fp"] == 0
    assert results["ALL"]["recall"] >= 0.5


def test_coverage_cut_uses_event_junction_only(tmp_path):
    """The coverage-cut statistic is the EVENT junction's coverage, min
    across quantified conditions (reference eparser.py:267-279) — NOT the
    min over every W value, where the absent side's 0 would veto any cut."""
    from pantas_tpu.eval.compare import parse_quant_remap

    csv = tmp_path / "qr.csv"
    csv.write_text(
        "etype,header\n"
        + "ES," + ",".join("x" * 1 for _ in range(14))
        + ",0/35,19/26,0.0,0.5,0.5\n"  # canonic 0 in c1: event covs 35, 26
        + "IR," + ",".join("x" * 1 for _ in range(14))
        + ",.,12/7,1,0.4,0.6\n"  # one-sided: only c2 counts
    )
    rows = parse_quant_remap(str(csv))
    assert rows[0].w_min == 26.0
    assert rows[1].w_min == 7.0


def test_variants_gtf_round_trips_through_parser(tmp_path):
    """write_variants_gtf output must parse and map variant tids to genes."""
    from pantas_tpu.eval.simulate import SimEvent, write_variants_gtf
    from pantas_tpu.io.gtf import parse_transcript_maps

    base = tmp_path / "g.gtf"
    base.write_text(
        'c\ts\ttranscript\t1\t900\t.\t+\t.\tgene_id "G"; transcript_id "T1";\n'
        'c\ts\texon\t1\t200\t.\t+\t.\tgene_id "G"; transcript_id "T1";\n'
        'c\ts\texon\t701\t900\t.\t+\t.\tgene_id "G"; transcript_id "T1";\n'
    )
    ev = SimEvent(
        etype="CE", gene="G", tid="T1", chrom="c", strand="+",
        regions=[], event_exons=[(1, 200), (401, 500), (701, 900)],
    )
    out = tmp_path / "variants.gtf"
    write_variants_gtf([ev], str(base), str(out))
    t2g, genestrand, genechr = parse_transcript_maps(str(out))
    assert t2g["G_ce"] == "G" and t2g["T1"] == "G"
    assert genestrand["G"] == "+"

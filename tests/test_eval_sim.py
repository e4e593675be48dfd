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

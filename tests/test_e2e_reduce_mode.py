"""End-to-end pipeline on example/4 in reduce mode (hp=2, `build -r`).

The reduced graph (transcript id-interval subgraph, split reference
sub-paths — the reference's gene-panel/"reduced indexing" configuration,
`build.smk:190-201` + `exps/3-homo-real`) must flow through map → augment →
call → quant → remap, with augment byte-identical and call row-identical to
the reference scripts run on the same reduced artifacts.
"""

import sys

import pytest

from conftest import REFERENCE, run_cli

EXAMPLE = REFERENCE / "example"


@pytest.fixture(scope="module")
def reduced_pipeline(tmp_path_factory, reference_scripts):
    if not EXAMPLE.is_dir():
        pytest.skip("example data not available")
    wd = tmp_path_factory.mktemp("ex4hp2")
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "build", "-r",
         str(EXAMPLE / "4.fa"), str(EXAMPLE / "4.gtf"), str(EXAMPLE / "4.vcf.gz"),
         "-o", str(wd)],
    )
    gfa = wd / "pantranscriptome-annotated.gfa"
    assert gfa.exists()
    gaf = wd / "sample.gaf"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "map", str(gfa),
         str(EXAMPLE / "reads_1.fq"), str(EXAMPLE / "reads_2.fq")],
        out_path=gaf,
    )
    return wd, gfa, gaf


def test_reduced_graph_has_split_ref_paths(reduced_pipeline):
    _, gfa, _ = reduced_pipeline
    names = [
        line.split("\t")[1]
        for line in gfa.read_text().splitlines()
        if line.startswith("P")
    ]
    # reference path is split into numbered sub-paths when gaps are dropped,
    # or stays whole if the panel has no inter-gene gap — either way
    # transcript paths survive reduction
    assert any("_R1" in n for n in names)


def test_reduce_e2e_augment_call_differential(reduced_pipeline, reference_scripts, tmp_path):
    wd, gfa, gaf = reduced_pipeline
    ours_aug = wd / "aug.gfa"
    ref_aug = wd / "ref_aug.gfa"
    run_cli([sys.executable, "-m", "pantas_tpu", "augment", str(gaf), str(gfa)], ours_aug)
    run_cli(
        [sys.executable, str(reference_scripts / "alignments_augmentation_from_gaf.py"),
         str(gaf), str(gfa)],
        ref_aug,
    )
    assert ours_aug.read_bytes() == ref_aug.read_bytes()

    ours_ev = wd / "events.csv"
    ref_ev = wd / "ref_events.csv"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "call", "--rca", "0",
         str(ours_aug), str(EXAMPLE / "4.gtf")],
        ours_ev, hashseed="0",
    )
    run_cli(
        [sys.executable, str(reference_scripts / "call.py"), "--rca", "0",
         str(ours_aug), str(EXAMPLE / "4.gtf")],
        ref_ev, hashseed="0",
    )
    ours_rows = sorted(ours_ev.read_text().splitlines())
    assert ours_rows == sorted(ref_ev.read_text().splitlines())
    assert len(ours_rows) > 50

    # DIVERGENCE (documented): with --novel the REFERENCE crashes on this
    # reduced graph (`call.py:1033-1050` greedy IR-2 walk hits a dead end,
    # `max()` on empty iterable); our caller must survive and produce rows.
    ours_novel = wd / "events-novel.csv"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "call", "--rca", "0", "--novel",
         str(ours_aug), str(EXAMPLE / "4.gtf")],
        ours_novel, hashseed="0",
    )
    assert len(ours_novel.read_text().splitlines()) >= len(ours_rows)

    # quant + remap complete on the reduced-graph event set
    quant = wd / "quant.csv"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "quant", "-a",
         "--c1", str(ours_ev), "--c2", str(ours_ev)],
        quant,
    )
    remap = wd / "quant-remap.csv"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "remap", str(quant), str(EXAMPLE / "4.gtf")],
        remap,
    )
    assert len(remap.read_text().splitlines()) > 50

"""End-to-end differential test on example/4 (the reference's own fixture).

Builds the annotated spliced pangenome from FA+GTF+VCF with OUR build layer,
maps the 250 example read pairs with OUR mapper, then validates every
downstream stage against the reference scripts on the same artifacts:

* augment: byte-identical augmented GFA,
* call:    row-set identical events (under a pinned PYTHONHASHSEED — the
           reference's own row content varies with hash seed in 9 IR rows),
* quant:   byte-identical,
* remap:   byte-identical.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
EXAMPLE = Path("/root/reference/example")


def _run(cmd, out_path=None, hashseed=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    if hashseed is not None:
        env["PYTHONHASHSEED"] = hashseed
    if out_path is not None:
        with open(out_path, "w") as out:
            proc = subprocess.run(cmd, stdout=out, stderr=subprocess.PIPE, env=env, text=True)
    else:
        proc = subprocess.run(cmd, capture_output=True, env=env, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]


@pytest.fixture(scope="session")
def example_pipeline(tmp_path_factory, reference_scripts, example_graph):
    if not EXAMPLE.is_dir():
        pytest.skip("example data not available")
    wd = tmp_path_factory.mktemp("ex4")
    gfa = example_graph
    gaf = wd / "sample.gaf"
    _run(
        [sys.executable, "-m", "pantas_tpu", "map", str(gfa),
         str(EXAMPLE / "reads_1.fq"), str(EXAMPLE / "reads_2.fq")],
        out_path=gaf,
    )
    return wd, gfa, gaf


def test_e2e_augment_byte_identical(example_pipeline, reference_scripts):
    wd, gfa, gaf = example_pipeline
    ours = wd / "augmented.gfa"
    ref = wd / "ref_augmented.gfa"
    _run([sys.executable, "-m", "pantas_tpu", "augment", str(gaf), str(gfa)], ours)
    _run(
        [sys.executable, str(reference_scripts / "alignments_augmentation_from_gaf.py"),
         str(gaf), str(gfa)],
        ref,
    )
    assert ours.read_bytes() == ref.read_bytes()


def test_e2e_call_quant_remap_identical(example_pipeline, reference_scripts):
    wd, gfa, gaf = example_pipeline
    aug = wd / "augmented.gfa"
    if not aug.exists():
        _run([sys.executable, "-m", "pantas_tpu", "augment", str(gaf), str(gfa)], aug)

    ours_ev = wd / "events.csv"
    ref_ev = wd / "ref_events.csv"
    _run(
        [sys.executable, "-m", "pantas_tpu", "call", "--rca", "0", str(aug),
         str(EXAMPLE / "4.gtf")],
        ours_ev,
        hashseed="0",
    )
    _run(
        [sys.executable, str(reference_scripts / "call.py"), "--rca", "0", str(aug),
         str(EXAMPLE / "4.gtf")],
        ref_ev,
        hashseed="0",
    )
    ours_rows = sorted(ours_ev.read_text().splitlines())
    ref_rows = sorted(ref_ev.read_text().splitlines())
    assert ours_rows == ref_rows
    assert len(ours_rows) > 100  # a real event set, not a trivial pass

    ours_q = wd / "quant.csv"
    ref_q = wd / "ref_quant.csv"
    _run(
        [sys.executable, "-m", "pantas_tpu", "quant", "-a",
         "--c1", str(ours_ev), "--c2", str(ours_ev)],
        ours_q,
    )
    _run(
        [sys.executable, str(reference_scripts / "quantify.py"),
         "--c1", str(ours_ev), "--c2", str(ours_ev)],
        ref_q,
    )
    assert ours_q.read_bytes() == ref_q.read_bytes()

    ours_r = wd / "quant-remap.csv"
    ref_r = wd / "ref_quant-remap.csv"
    _run(
        [sys.executable, "-m", "pantas_tpu", "remap", str(ours_q),
         str(EXAMPLE / "4.gtf")],
        ours_r,
    )
    _run(
        [sys.executable, str(reference_scripts / "remap.py"), str(ref_q),
         str(EXAMPLE / "4.gtf")],
        ref_r,
    )
    assert ours_r.read_bytes() == ref_r.read_bytes()
    n_events = len(ours_r.read_text().splitlines()) - 1
    # reference README's anchor for its vg-built graph is 205 events; our
    # independently built graph must land in the same regime
    assert 150 <= n_events <= 260, n_events
    # exact regression anchor for OUR deterministic build+mapper pipeline
    # (210 quant-remap rows at rca=0; the call stage emits 218 rows, some
    # of which quant/remap legitimately drop) — a change here means the
    # build/mapper/caller changed behavior, not just the range
    assert n_events == 210, n_events

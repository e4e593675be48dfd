"""Sim-truth pipeline differentials: simrc + build_truth byte-identical.

The simulator emits ASimulatoR-compatible artifacts (exon_junction /
event_annotation / provenance-named FASTQ); the reference's truth scripts
consume them directly (its ``simrc.py`` needs the Bio + intervaltree stubs
in tests/stubs). Our reimplementations must match byte-for-byte, including
the leaked-read-loop-coordinate quirk in the retained-intron rows.
"""

import io
import os
import subprocess
import sys
from pathlib import Path

import pytest

from conftest import REFERENCE, REPO_ROOT, run_cli

REF_SIMRC = REFERENCE / "exps/1-dm-sim/scripts/simrc.py"
REF_TRUTH = REFERENCE / "exps/1-dm-sim/scripts/build_truth.py"
STUBS = Path(__file__).parent / "stubs"
EXAMPLE = REFERENCE / "example"


@pytest.fixture(scope="module")
def sim_artifacts(tmp_path_factory):
    wd = tmp_path_factory.mktemp("simtruth")
    prefix = wd / "sim"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "sim",
         str(EXAMPLE / "4.fa"), str(EXAMPLE / "4.gtf"),
         "-o", str(prefix), "-n", "14", "-r", "20",
         "--etypes", "ES", "IR", "A3", "A5", "CE"],
    )
    return prefix


def _ref(cmd, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO_ROOT}:{STUBS}"
    env["PYTHONHASHSEED"] = "0"
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=cwd)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_simrc_differential(sim_artifacts, tmp_path):
    from pantas_tpu.eval.sim_truth import simrc

    jun = f"{sim_artifacts}_exon_junction.tsv"
    ann = f"{sim_artifacts}_event_annotation.tsv"
    for cond in ("c1", "c2"):
        fq = f"{sim_artifacts}_{cond}_1.fq"
        ours = io.StringIO()
        simrc(fq, jun, ann, ours)
        theirs = _ref([sys.executable, str(REF_SIMRC), fq, jun, ann], tmp_path)
        assert ours.getvalue() == theirs, cond


def test_build_truth_differential(sim_artifacts, tmp_path):
    from pantas_tpu.eval.sim_truth import build_truth, merge_rc, simrc

    jun = f"{sim_artifacts}_exon_junction.tsv"
    ann = f"{sim_artifacts}_event_annotation.tsv"
    rcs = {}
    for cond in ("c1", "c2"):
        buf = io.StringIO()
        simrc(f"{sim_artifacts}_{cond}_1.fq", jun, ann, buf)
        p = tmp_path / f"rc_{cond}.csv"
        p.write_text(buf.getvalue())
        rcs[cond] = str(p)
    counts = tmp_path / "counts.csv"
    with open(counts, "w") as fh:
        merge_rc([rcs["c1"]], [rcs["c2"]], fh)

    ours = io.StringIO()
    build_truth(ann, str(counts), ours)
    theirs = _ref([sys.executable, str(REF_TRUTH), ann, str(counts)], tmp_path)
    assert ours.getvalue() == theirs

    rows = [r.split(",") for r in ours.getvalue().splitlines()]
    etypes = {r[0] for r in rows}
    strands = {(r[0], r[3]) for r in rows}
    # all four truth-emitting families present, incl. a '-'-strand event
    assert {"ES", "IR", "A3", "A5"} <= etypes
    assert any(st == "-" for _, st in strands)
    # IR rows carry real retained-intron coverage in condition 2 (the
    # merge keys must survive the leaked-coordinate quirk columns)
    ir = [r for r in rows if r[0] == "IR"]
    assert ir and all(int(r[8].split("/")[1]) > 0 for r in ir)
    # condition-1 PSI is 1.0 (template only), condition-2 PSI < 1
    assert all(float(r[9]) == 1.0 for r in rows)
    assert all(float(r[10]) < 1.0 for r in rows)


def test_ce_truth_channel(sim_artifacts):
    """CE events reach the regions-CSV truth channel (build_truth has no
    cassette branch, matching the reference script)."""
    truth = open(f"{sim_artifacts}_truth.csv").read().splitlines()
    ce = [r for r in truth if r.startswith("CE,")]
    assert ce, "simulator emitted no CE truth rows"
    ann = open(f"{sim_artifacts}_event_annotation.tsv").read()
    assert "\tce\t" in ann or ann.count("ce\t") > 0

"""Differential tests: quant + remap vs the reference scripts (byte-exact).

Both stages are deterministic (row order follows input order), so outputs
must match byte-for-byte, including float formatting.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from fixtures_quant import write_quant_fixtures

REPO = Path(__file__).resolve().parent.parent


def _run(cmd):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


QUANT_MODES = [([], ["-a"]), (["--both"], []), (["-w", "3"], ["-a", "-w", "3"])]


@pytest.mark.parametrize(
    "ref_mode,our_mode", QUANT_MODES, ids=["all", "both", "w3"]
)
def test_quant_matches_reference_bytes(tmp_path, reference_scripts, ref_mode, our_mode):
    c1, c2, _ = write_quant_fixtures(tmp_path)
    theirs = _run(
        [sys.executable, str(reference_scripts / "quantify.py"), *ref_mode, "--c1", *c1, "--c2", *c2]
    )
    ours = _run(
        [sys.executable, "-m", "pantas_tpu", "quant", *our_mode, "--c1", *c1, "--c2", *c2]
    )
    assert ours == theirs


@pytest.mark.parametrize("min_intron", [None, 2], ids=["default", "i2"])
def test_remap_matches_reference_bytes(tmp_path, reference_scripts, min_intron):
    c1, c2, gtf = write_quant_fixtures(tmp_path)
    quant_csv = tmp_path / "quant.csv"
    quant_csv.write_text(
        _run(
            [sys.executable, str(reference_scripts / "quantify.py"), "--c1", *c1, "--c2", *c2]
        )
    )
    extra = [] if min_intron is None else ["-i", str(min_intron)]
    theirs = _run(
        [sys.executable, str(reference_scripts / "remap.py"), *extra, str(quant_csv), gtf]
    )
    ours = _run(
        [sys.executable, "-m", "pantas_tpu", "remap", str(quant_csv), gtf, *extra]
    )
    assert ours == theirs
    # the default min-intron filter must actually drop the short novel ES
    if min_intron is None:
        assert "ES,novel" not in theirs
    else:
        assert "ES,novel" in theirs


def test_full_stage_chain(tmp_path, reference_scripts):
    """quant -> remap chained through OUR implementations only, diffed
    against the reference chain end-to-end."""
    c1, c2, gtf = write_quant_fixtures(tmp_path)

    ours_q = _run([sys.executable, "-m", "pantas_tpu", "quant", "-a", "--c1", *c1, "--c2", *c2])
    (tmp_path / "ours_quant.csv").write_text(ours_q)
    ours_r = _run(
        [sys.executable, "-m", "pantas_tpu", "remap", str(tmp_path / "ours_quant.csv"), gtf, "-i", "2"]
    )

    theirs_q = _run(
        [sys.executable, str(reference_scripts / "quantify.py"), "--c1", *c1, "--c2", *c2]
    )
    (tmp_path / "ref_quant.csv").write_text(theirs_q)
    theirs_r = _run(
        [sys.executable, str(reference_scripts / "remap.py"), "-i", "2", str(tmp_path / "ref_quant.csv"), gtf]
    )
    assert ours_q == theirs_q
    assert ours_r == theirs_r

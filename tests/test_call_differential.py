"""Differential test: our event caller vs the reference call.py.

Row order of both implementations is PYTHONHASHSEED-dependent (set
iteration), so equality is on the sorted row multiset. Both sides run as
subprocesses under the same PYTHONHASHSEED so even iteration-order-dependent
tie-breaks match.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from fixtures_call import write_call_fixtures

REPO = Path(__file__).resolve().parent.parent


def _run(cmd, hashseed="0"):
    env = dict(os.environ)
    env["PYTHONHASHSEED"] = hashseed
    env["PYTHONPATH"] = str(REPO)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def _call_ours(gfa, gtf, *extra):
    return _run(
        [sys.executable, "-m", "pantas_tpu", "call", gfa, gtf, *extra]
    )


def _call_reference(reference_scripts, gfa, gtf, *extra):
    return _run(
        [sys.executable, str(reference_scripts / "call.py"), *extra, gfa, gtf]
    )


def _sorted_rows(csv_text):
    lines = csv_text.strip("\n").split("\n")
    return lines[0], sorted(lines[1:])


CASES = [
    (),
    ("--novel",),
    ("--novel", "--minintronsize", "4"),
    ("--novel", "--no-annotated", "--minintronsize", "4"),
    ("--rca", "3", "--novel", "--minintronsize", "4"),
    ("--events", "ES", "--novel", "--minintronsize", "4"),
    ("--events", "SS", "--rca", "-1"),
    ("--events", "IR", "--novel", "--minintronsize", "4"),
    ("--novel", "--isw", "1"),
]


@pytest.mark.parametrize("extra", CASES, ids=[" ".join(c) or "default" for c in CASES])
@pytest.mark.parametrize("fixture", ["splice", "cassette"])
def test_call_matches_reference(tmp_path, reference_scripts, fixture, extra):
    paths = write_call_fixtures(tmp_path)
    gfa, gtf = paths[fixture]
    ours = _sorted_rows(_call_ours(gfa, gtf, *extra))
    theirs = _sorted_rows(_call_reference(reference_scripts, gfa, gtf, *extra))
    assert ours[0] == theirs[0]
    assert ours[1] == theirs[1]


def test_call_finds_expected_event_classes(tmp_path, reference_scripts):
    paths = write_call_fixtures(tmp_path)
    gfa, gtf = paths["splice"]
    out = _call_ours(gfa, gtf, "--novel", "--minintronsize", "4")
    etypes = {(l.split(",")[0], l.split(",")[1]) for l in out.strip().split("\n")[1:]}
    assert ("ES", "annotated") in etypes
    assert ("IR", "annotated") in etypes
    assert ("A5", "annotated") in etypes or ("A3", "annotated") in etypes
    assert ("ES", "novel") in etypes
    assert ("A3", "novel") in etypes or ("A5", "novel") in etypes
    assert ("IR", "novel") in etypes

    gfa, gtf = paths["cassette"]
    out = _call_ours(gfa, gtf, "--novel", "--minintronsize", "4")
    etypes = {(l.split(",")[0], l.split(",")[1]) for l in out.strip().split("\n")[1:]}
    assert ("CE", "novel") in etypes
    assert ("IR", "novel") in etypes

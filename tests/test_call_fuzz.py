"""Seeded randomized call differential: the splice fixture's STRUCTURE is
fixed (so no new reference crash classes appear) while every NC/RC
coverage value is randomized — exercising support thresholds, PSI branch
selection, and first-hit pair selection under many coverage assignments.
Row multisets must match the reference caller under the same
PYTHONHASHSEED on every seed."""

import os
import random
import re
import subprocess
import sys
from pathlib import Path

import pytest

from fixtures_call import SPLICE_GFA, write_call_fixtures

REPO = Path(__file__).resolve().parent.parent


def _run(cmd):
    env = dict(os.environ)
    env["PYTHONHASHSEED"] = "0"
    env["PYTHONPATH"] = str(REPO)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def _randomize_counts(gfa_text: str, rng: random.Random) -> str:
    out = []
    for line in gfa_text.splitlines():
        line = re.sub(r"NC:i:\d+", lambda m: f"NC:i:{rng.randint(0, 15)}", line)
        line = re.sub(r"RC:i:\d+", lambda m: f"RC:i:{rng.randint(0, 15)}", line)
        out.append(line)
    return "\n".join(out) + "\n"


@pytest.mark.parametrize(
    "extra",
    [("--rca", "0"), ("--novel", "--minintronsize", "4"), ("--rca", "3", "--novel")],
    ids=["rca0", "novel", "rca3-novel"],
)
def test_call_fuzz_matches_reference(tmp_path, reference_scripts, extra):
    _, gtf = write_call_fixtures(tmp_path)["splice"]
    for seed in range(4):
        rng = random.Random(seed)
        gfa = tmp_path / f"fz{seed}.gfa"
        gfa.write_text(_randomize_counts(SPLICE_GFA, rng))
        theirs = _run(
            [sys.executable, str(reference_scripts / "call.py"),
             *extra, str(gfa), str(gtf)]
        )
        ours = _run(
            [sys.executable, "-m", "pantas_tpu", "call", str(gfa), str(gtf), *extra]
        )
        t_lines = theirs.strip("\n").split("\n")
        o_lines = ours.strip("\n").split("\n")
        assert o_lines[0] == t_lines[0]
        assert sorted(o_lines[1:]) == sorted(t_lines[1:]), f"seed {seed} {extra}"

"""Standalone reducer must be byte-identical to the reference's reduce.py.

The reference tool needs the ``intervaltree`` package (not installed);
``tests/stubs/intervaltree.py`` provides the tiny API subset it uses, so
both implementations run on the same inputs and their stdout is compared
byte-for-byte — including the reference's dropped-final-subpath quirk
(``reduce.py:52-67``: no flush after the loop).
"""

import subprocess
import sys
from pathlib import Path

from conftest import REFERENCE, run_cli

STUBS = str(Path(__file__).parent / "stubs")
REF_REDUCE = REFERENCE / "build" / "reduce.py"


def _make_gfa(tmp_path, tridx="ENST"):
    """30-node chain; transcripts at the start, middle (reverse orientation),
    and END of the reference path (the end one exercises the dropped final
    sub-path quirk)."""
    lines = ["H\tVN:Z:1.1"]
    for i in range(1, 31):
        lines.append(f"S\t{i}\tACGT")
    for i in range(1, 30):
        lines.append(f"L\t{i}\t+\t{i + 1}\t+\t*")
    ref_steps = ",".join(f"{i}+" for i in range(1, 31))
    lines.append(f"P\tdecoy\t1+,2+\t*")  # earlier ref candidate: last wins
    lines.append(f"P\tchrZ\t{ref_steps}\t*")
    lines.append(f"P\t{tridx}0001\t" + ",".join(f"{i}+" for i in range(3, 9)) + "\t*")
    # reverse-orientation transcript (ids descending, '-' steps)
    lines.append(
        f"P\t{tridx}0002\t" + ",".join(f"{i}-" for i in range(18, 11, -1)) + "\t*"
    )
    lines.append(f"P\t{tridx}0003\t" + ",".join(f"{i}+" for i in range(26, 31)) + "\t*")
    p = tmp_path / "in.gfa"
    p.write_text("".join(l + "\n" for l in lines))
    return p


def _run_reference(gfa, out_path, extra=()):
    run_cli(
        [sys.executable, str(REF_REDUCE), *extra, str(gfa)],
        out_path=out_path,
        env_extra={"PYTHONPATH": STUBS},
    )


def _run_ours(gfa, out_path, extra=()):
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "reduce", *extra, str(gfa)],
        out_path=out_path,
    )


def test_reduce_differential_default(tmp_path):
    gfa = _make_gfa(tmp_path)
    _run_reference(gfa, tmp_path / "ref.out")
    _run_ours(gfa, tmp_path / "ours.out")
    ref = (tmp_path / "ref.out").read_bytes()
    ours = (tmp_path / "ours.out").read_bytes()
    assert ours == ref
    text = ours.decode()
    # the middle gap (nodes 9-11, 19-25) splits the ref path; the trailing
    # kept segment (26-30) is dropped by the preserved quirk
    assert "P\tchrZ.0\t" in text and "P\tchrZ.1\t" in text
    assert "P\tchrZ.2\t" not in text
    assert "P\tdecoy" not in text
    assert "S\t10\t" not in text and "S\t27\t" in text


def test_reduce_differential_k_and_tridx(tmp_path):
    gfa = _make_gfa(tmp_path, tridx="TX")
    for extra in (["-t", "TX"], ["-t", "TX", "-k", "2"]):
        _run_reference(gfa, tmp_path / "ref.out", extra)
        _run_ours(gfa, tmp_path / "ours.out", extra)
        ref = (tmp_path / "ref.out").read_bytes()
        assert ref  # reference actually produced output
        assert (tmp_path / "ours.out").read_bytes() == ref

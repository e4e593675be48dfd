"""Legacy build utilities must be byte-identical to the reference scripts
(prune_gfa.py, reintroduce_paths.py) on the same inputs."""

import subprocess
import sys

from conftest import REFERENCE, run_cli

SCRIPTS = REFERENCE / "scripts"


def _make_gfa(tmp_path):
    lines = ["H\tVN:Z:1.1"]
    for i in range(1, 21):
        lines.append(f"S\t{i}\tAC")
    for i in range(1, 20):
        lines.append(f"L\t{i}\t+\t{i + 1}\t+\t*")
    ref_steps = ",".join(f"{i}+" for i in range(1, 21))
    lines.append(f"P\tchrY\t{ref_steps}\t*")
    lines.append("P\tENSTA\t3+,4+,5+\t*")
    lines.append("P\tENSTB\t9+,10+,11+\t*")
    lines.append("P\tENSTC\t18+,19+,20+\t*")
    lines.append("P\t_alt_1_0\t4+\t*")
    # chrY gets gap-split at the inter-gene holes AND ends inside ENSTC's
    # kept interval (exercises the dropped-final-segment quirk)
    p = tmp_path / "in.gfa"
    p.write_text("".join(l + "\n" for l in lines))
    return p


def test_prune_differential(tmp_path):
    gfa = _make_gfa(tmp_path)
    for extra in ([], ["-w", "1"], ["-t", "ENSTB"]):
        run_cli(
            [sys.executable, str(SCRIPTS / "prune_gfa.py"), *extra, str(gfa)],
            out_path=tmp_path / "ref.out",
        )
        run_cli(
            [sys.executable, "-m", "pantas_tpu", "prune", *extra, str(gfa)],
            out_path=tmp_path / "ours.out",
        )
        ref = (tmp_path / "ref.out").read_bytes()
        assert ref
        assert (tmp_path / "ours.out").read_bytes() == ref


def test_reintroduce_differential(tmp_path):
    gfa = _make_gfa(tmp_path)
    # prune keeps every edge that the kept paths walk, so reintroduction of
    # the transcript paths validates; build a pruned file first
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "prune", "-w", "20", str(gfa)],
        out_path=tmp_path / "pruned.gfa",
    )
    run_cli(
        [sys.executable, str(SCRIPTS / "reintroduce_paths.py"), str(gfa),
         str(tmp_path / "pruned.gfa")],
        out_path=tmp_path / "ref.out",
    )
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "reintroduce-paths", str(gfa),
         str(tmp_path / "pruned.gfa")],
        out_path=tmp_path / "ours.out",
    )
    ref = (tmp_path / "ref.out").read_bytes()
    assert ref
    assert (tmp_path / "ours.out").read_bytes() == ref


def test_reintroduce_fails_empty_on_missing_edge(tmp_path):
    gfa = _make_gfa(tmp_path)
    # a pruned graph missing edges the original paths need -> both tools
    # must fail BEFORE emitting anything (validate-first double pass)
    (tmp_path / "pruned.gfa").write_text("H\tVN:Z:1.1\nL\t1\t+\t2\t+\t*\n")
    for cmd in (
        [sys.executable, str(SCRIPTS / "reintroduce_paths.py"), str(gfa),
         str(tmp_path / "pruned.gfa")],
        [sys.executable, "-m", "pantas_tpu", "reintroduce-paths", str(gfa),
         str(tmp_path / "pruned.gfa")],
    ):
        with open(tmp_path / "out", "w") as fh:
            proc = subprocess.run(cmd, stdout=fh, stderr=subprocess.DEVNULL)
        assert proc.returncode != 0
        assert (tmp_path / "out").read_bytes() == b""

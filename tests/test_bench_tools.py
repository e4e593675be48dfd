"""Bench tooling: time -v parsing identical to the reference's
compare_bench.py parser; run_timed round-trips through both."""

import importlib.util
import sys

import pytest

from conftest import REFERENCE

COMPARE_BENCH = (
    REFERENCE / "exps" / "2-dm-real" / "workflow" / "scripts" / "compare_bench.py"
)

SAMPLE = (
    '\tCommand being timed: "sleep 1"\n'
    "\tUser time (seconds): 12.34\n"
    "\tSystem time (seconds): 0.56\n"
    "\tPercent of CPU this job got: 99%\n"
    "\tElapsed (wall clock) time (h:mm:ss or m:ss): 1:02:03\n"
    "\tMaximum resident set size (kbytes): 345678\n"
    "\tExit status: 0\n"
)


def _ref_parser():
    spec = importlib.util.spec_from_file_location("ref_compare_bench", COMPARE_BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.parse_time_verbose


def test_parse_differential(tmp_path):
    f = tmp_path / "call.s1.w3.time"
    f.write_text(SAMPLE)
    from pantas_tpu.eval.bench import parse_time_verbose

    ours = parse_time_verbose(str(f), "pantas")
    ref = _ref_parser()(str(f), "pantas")
    assert ours == ref
    assert ours["wall_clock"] == [3723.0]
    assert ours["user_time"] == [12.34]
    assert ours["max_mem"] == [345678]


def test_parse_mmss(tmp_path):
    f = tmp_path / "x.time"
    f.write_text(SAMPLE.replace("1:02:03", "1:23.45"))
    from pantas_tpu.eval.bench import parse_time_verbose

    ours = parse_time_verbose(str(f), "t")
    assert ours == _ref_parser()(str(f), "t")
    assert ours["wall_clock"] == [83.45]


def test_run_timed_roundtrip(tmp_path):
    from pantas_tpu.eval.bench import parse_time_verbose, run_timed

    tf = tmp_path / "stage.time"
    rc = run_timed(
        [sys.executable, "-c", "x = sum(range(10**6))"],
        str(tf),
    )
    assert rc == 0
    for parser in (parse_time_verbose, _ref_parser()):
        res = parser(str(tf), "pantas")
        assert set(res) >= {"user_time", "sys_time", "wall_clock", "max_mem"}
        assert res["wall_clock"][0] >= 0.0
        assert res["max_mem"][0] > 1000  # kbytes


def test_collect_table(tmp_path):
    from pantas_tpu.eval.bench import collect

    (tmp_path / "pantas").mkdir()
    (tmp_path / "pantas" / "call.s1.w3.time").write_text(SAMPLE)
    (tmp_path / "pantas" / "mpmap.s1.time").write_text(SAMPLE)
    (tmp_path / "rmats.time").write_text(SAMPLE)
    import io

    buf = io.StringIO()
    rows = collect(str(tmp_path), out=buf)
    assert [r["tool"] for r in rows] == ["pantas", "pantas", "rmats"]
    assert [r["w"] for r in rows] == ["3", "none", "none"]
    lines = buf.getvalue().splitlines()
    assert lines[0] == "tool,file_name,w,user_time,sys_time,wall_clock,max_mem"
    assert len(lines) == 4

"""Native engine under sanitizers (SURVEY §5: the reference has none; we
run the GAF hot loop + threaded parse + emission under ASan/UBSan and the
2-thread chunked parse under TSan via a standalone runner binary —
`pantas_tpu/native/sanitize_main.cpp`)."""

import os
import struct
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

NATIVE = Path(__file__).resolve().parent.parent / "pantas_tpu" / "native"


def _dump_meta(tensors, path):
    ids = np.asarray([int(n) for n in tensors.node_names], dtype=np.int64)
    dense = bool(
        len(ids) and ids[0] == 1 and np.array_equal(ids, np.arange(1, len(ids) + 1))
    )
    with open(path, "wb") as f:
        f.write(
            struct.pack(
                "<5q",
                tensors.n_nodes,
                len(tensors.edge_key),
                tensors.rc_base,
                tensors.total_slots,
                1 if dense else 0,
            )
        )
        f.write(ids.tobytes())
        f.write(np.ascontiguousarray(tensors.node_len, dtype=np.int32).tobytes())
        f.write(np.ascontiguousarray(tensors.edge_key, dtype=np.uint64).tobytes())
        f.write(np.ascontiguousarray(tensors.il_base, dtype=np.int64).tobytes())
        f.write(np.ascontiguousarray(tensors.ol_base, dtype=np.int64).tobytes())


def _make_inputs(tmp_path):
    """Small chain graph + a GAF exercising every parse path: forward /
    reverse walks, substitutions, indels, clipping, dv filter, low mapq,
    unplaced reads, unknown nodes, novel edges, malformed lines."""
    lines = ["H\tVN:Z:1.1"]
    for i in range(1, 9):
        lines.append(f"S\t{i}\tACGTAC")
    for i in range(1, 8):
        lines.append(f"L\t{i}\t+\t{i + 1}\t+\t*")
    lines.append("P\tT1_R1\t1+,2+,3+\t*")
    gfa = tmp_path / "g.gfa"
    gfa.write_text("".join(l + "\n" for l in lines))

    gaf_rows = [
        "r1\t12\t0\t12\t+\t>1>2\t12\t0\t11\t12\t12\t60\tdv:f:0.0\tcs:Z::12",
        "r2\t12\t0\t12\t+\t<2<1\t12\t0\t11\t12\t12\t60\tdv:f:0.0\tcs:Z::12",
        "r3\t12\t0\t12\t+\t>3>4>5\t18\t3\t14\t12\t12\t60\tdv:f:0.01\tcs:Z::5*ac:3-aa:2+gg:2",
        "r4\t12\t0\t12\t+\t>1>3\t12\t0\t11\t12\t12\t60\tdv:f:0.0\tcs:Z::12",  # novel edge
        "r5\t12\t0\t12\t+\t*\t12\t0\t11\t12\t12\t60\tdv:f:0.0\tcs:Z::12",  # unplaced
        "r6\t12\t0\t12\t+\t>1>2\t12\t0\t11\t12\t12\t5\tdv:f:0.0\tcs:Z::12",  # low mapq
        "r7\t12\t0\t12\t+\t>1>2\t12\t0\t11\t12\t12\t60\tdv:f:0.9\tcs:Z::12",  # dv filter
        "r8\t12\t0\t12\t+\t>99>100\t12\t0\t11\t12\t12\t60\tdv:f:0.0\tcs:Z::12",  # unknown
        "r9\t12\t0\t12\t+\t>5>5>6\t12\t0\t11\t12\t12\t60\tdv:f:0.0\tcs:Z:+aa:10",  # dup+clip
        "short\tmalformed",
        "",
    ]
    gaf = tmp_path / "s.gaf"
    # repeat to give the 2-thread chunked parse something to split
    gaf.write_text("".join((r + "\n") for r in gaf_rows * 500))
    return gfa, gaf


def _build(tmp_path, sanitize):
    exe = tmp_path / f"sanitize_{sanitize.replace(',', '_')}"
    cmd = [
        "g++", "-O1", "-g", "-std=c++17", "-pthread",
        f"-fsanitize={sanitize}", "-fno-omit-frame-pointer",
        str(NATIVE / "sanitize_main.cpp"), "-o", str(exe),
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=str(NATIVE))
    if proc.returncode != 0:
        pytest.skip(f"-fsanitize={sanitize} unavailable: {proc.stderr[-300:]}")
    return exe


@pytest.mark.parametrize(
    "sanitize,threads",
    [("address,undefined", 1), ("address,undefined", 2), ("thread", 2)],
)
def test_native_engine_sanitized(tmp_path, sanitize, threads):
    gfa, gaf = _make_inputs(tmp_path)
    from pantas_tpu.graph.compiler import compile_gfa

    meta = tmp_path / "meta.bin"
    _dump_meta(compile_gfa(str(gfa)), meta)
    exe = _build(tmp_path, sanitize)
    env = dict(os.environ, ASAN_OPTIONS="detect_leaks=1", UBSAN_OPTIONS="halt_on_error=1")
    proc = subprocess.run(
        [str(exe), str(gaf), str(meta), str(gfa), str(threads)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode == 0, (proc.stdout[-500:], proc.stderr[-2000:])
    assert "lines=" in proc.stdout

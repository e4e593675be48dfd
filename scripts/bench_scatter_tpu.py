#!/usr/bin/env python3
"""Race the coverage scatter-add implementations on the real TPU chip.

Candidates (coverage/pallas_kernel.py): XLA `.at[].add` scatter, the
sorted-run Pallas kernel (sort + windowed MXU histogram), and the legacy
one-hot RMW Pallas kernel. Timing uses a host readback of a small slice —
`block_until_ready` does NOT actually sync on the axon tunnel (measured:
it reports impossible rates), so every timed run ends with
`np.asarray(r[:8])`.

Usage: python scripts/bench_scatter_tpu.py [n_slots] [stream sizes...]
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from pantas_tpu.coverage.pallas_kernel import (
        coverage_scatter_add,
        sorted_coverage_scatter_add,
        xla_scatter_add,
    )

    n_slots = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
    streams = [int(x) for x in sys.argv[2:]] or [1 << 20, 1 << 22, 1 << 25]

    dev = jax.devices()[0]
    print(f"[scatter-tpu] device: {dev} ({dev.platform})", file=sys.stderr)
    rng = np.random.default_rng(0)
    counts = jnp.zeros((n_slots,), dtype=jnp.int32)

    impls = {
        "xla": jax.jit(xla_scatter_add),
        "pallas-sorted": jax.jit(sorted_coverage_scatter_add),
        "pallas-onehot": jax.jit(coverage_scatter_add),
    }

    # correctness via 4096 probed slots + the total sum: a full-counts
    # host readback over the axon tunnel runs at ~14 KB/s (measured —
    # 8 MB took ~10 min), so only small gathers come back
    probes_np = rng.integers(0, n_slots, size=4096)
    probes = jnp.asarray(probes_np.astype(np.int32))

    for m in streams:
        idx_np = rng.integers(-1, n_slots, size=m, dtype=np.int32)
        idx = jax.device_put(idx_np)
        valid = idx_np[idx_np >= 0]
        expect = np.bincount(valid, minlength=n_slots).astype(np.int32)
        expect_probe = expect[probes_np]
        expect_sum = int(expect.sum())
        for name, fn in impls.items():
            try:
                t0 = time.time()
                r = fn(counts, idx)
                ok = (
                    int(jnp.sum(r)) == expect_sum
                    and np.array_equal(np.asarray(r[probes]), expect_probe)
                )
                compile_and_run = time.time() - t0
                best = None
                for _ in range(3):
                    t0 = time.time()
                    r = fn(counts, idx)
                    np.asarray(r[:8])  # force completion (axon!)
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                print(json.dumps({
                    "metric": "scatter_add", "impl": name, "n_slots": n_slots,
                    "stream": m, "correct": bool(ok),
                    "first_run_s": round(compile_and_run, 3),
                    "best_s": round(best, 4),
                    "m_idx_per_s": round(m / best / 1e6, 1),
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "metric": "scatter_add", "impl": name, "n_slots": n_slots,
                    "stream": m, "error": str(e)[:300],
                }), flush=True)


if __name__ == "__main__":
    main()

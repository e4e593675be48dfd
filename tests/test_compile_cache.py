"""Persistent compilation cache + scatter-impl default selection.

The sorted-run Pallas kernel is raced against XLA by default only on TPU
backends (the cache makes the race's compile cost per-machine); on CPU the
engine must skip the race and use the plain jitted scatter unless
PANTAS_SCATTER=race forces it.
"""

import jax

from fixtures_micro import write_micro

from pantas_tpu.compile_cache import enable_persistent_cache
from pantas_tpu.coverage.device import DeviceCoverage
from pantas_tpu.graph.compiler import compile_gfa


def test_enable_persistent_cache_sets_config(tmp_path):
    old = jax.config.jax_compilation_cache_dir
    try:
        d = enable_persistent_cache(str(tmp_path / "cache"))
        assert d == str(tmp_path / "cache")
        assert jax.config.jax_compilation_cache_dir == d
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0
        assert jax.config.jax_persistent_cache_min_entry_size_bytes == -1
        # idempotent
        assert enable_persistent_cache(str(tmp_path / "cache")) == d
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_cpu_default_skips_race(tmp_path, monkeypatch):
    # CPU backend (conftest forces it) + unset PANTAS_SCATTER: the engine
    # must NOT run the kernel race — _step is the plain jitted scatter,
    # and accumulation still works.
    monkeypatch.delenv("PANTAS_SCATTER", raising=False)
    gfa, _ = write_micro(tmp_path)
    t = compile_gfa(gfa)
    assert jax.default_backend() == "cpu"
    cov = DeviceCoverage(t)
    import numpy as np

    cov.add_slots(np.array([0, 1, 1, -1], dtype=np.int32), pad_to=8)
    out = cov.result()
    assert out[0] == 1 and out[1] == 2


def test_cpu_forced_race_still_correct(tmp_path, monkeypatch):
    # PANTAS_SCATTER=race on CPU: the Pallas candidates fail verification,
    # the race re-picks XLA, results identical.
    monkeypatch.setenv("PANTAS_SCATTER", "race")
    gfa, _ = write_micro(tmp_path)
    t = compile_gfa(gfa)
    cov = DeviceCoverage(t)
    import numpy as np

    cov.add_slots(np.array([2, 2, 2, -1], dtype=np.int32), pad_to=8)
    assert cov.result()[2] == 3

"""Device mesh, sharding, and collectives."""

from pantas_tpu.parallel.mesh import coverage_mesh, data_parallel_scatter_add  # noqa: F401

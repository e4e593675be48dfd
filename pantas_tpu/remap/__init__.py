"""Graph-coordinate to linear-reference-coordinate remapping."""

from pantas_tpu.remap.remap import remap  # noqa: F401

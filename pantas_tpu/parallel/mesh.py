"""Mesh construction and the data-parallel coverage collective.

The only cross-device reduction the pipeline's math needs is an integer sum
of coverage partial counts (reads are i.i.d. work items whose contributions
are commutative scatter-adds), so the communication layer is exactly one
``psum`` over the data axis — associative integer adds make the result
bit-exact regardless of topology or shard count.

The reference has no distributed runtime at all (its parallelism is one OS
process per chromosome/replicate, ``build/build.smk`` + Snakemake); this
module is the TPU-native replacement: N chips per replicate instead of one
process per replicate.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

DATA_AXIS = "data"


def initialize_distributed() -> bool:
    """Join a multi-host jax runtime when launch env vars are present.

    Multi-host runs (one process per host, chips per host discovered
    automatically) coordinate through `jax.distributed`; GAF shards are
    assigned per process and coverage partials merge with the same psum the
    single-host path uses — DCN carries only the input shard distribution
    and the final gather (SURVEY §5 'communication backend' row).

    Returns True when distributed mode was initialized.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
        return True
    return False


def coverage_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    import numpy as np

    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (DATA_AXIS,))


def scatter_add_counts(counts: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """counts[idx] += 1 for every valid (>= 0) index; -1 entries are padding."""
    safe = jnp.where(idx >= 0, idx, 0)
    val = (idx >= 0).astype(counts.dtype)
    return counts.at[safe].add(val)


def data_parallel_scatter_add(mesh: Mesh):
    """Build the sharded coverage accumulator for a mesh.

    Returns a jitted fn ``(counts, idx) -> counts`` where ``idx`` is sharded
    over the data axis (each chip scatter-adds its shard privately) and the
    per-chip partial sums merge with one ``psum`` — the ICI-collective
    equivalent of the reference's per-replicate process merge.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(),
    )
    def _dp(counts, idx_shard):
        local = scatter_add_counts(jnp.zeros_like(counts), idx_shard)
        return counts + jax.lax.psum(local, DATA_AXIS)

    return jax.jit(_dp)


NODE_AXIS = "node"


def coverage_mesh_2d(devices, data: int, node: int) -> Mesh:
    """2-D mesh: data-parallel GAF shards × node-axis-sharded counts.

    The node axis is the framework's model/graph-parallel analogue (SURVEY
    §2.4): node ids are topologically sorted and chromosome-contiguous
    (combine's id-shift invariant), so contiguous count shards keep each
    chromosome's traffic on one shard group.
    """
    import numpy as np

    devs = np.asarray(devices).reshape(data, node)
    return Mesh(devs, (DATA_AXIS, NODE_AXIS))


def node_sharded_scatter_add(mesh: Mesh, total_slots: int):
    """Coverage step over a 2-D (data × node) mesh.

    ``counts`` is sharded over the node axis; the slot-index stream is
    sharded over the data axis and replicated over node. Each device
    scatter-adds only the indices that fall inside its node-shard range
    (others mask to zero) and partial sums merge with a psum over the data
    axis only — no cross-node-shard traffic, because ownership is by slot
    range.
    """
    n_node = mesh.shape[NODE_AXIS]
    shard = -(-total_slots // n_node)  # ceil; counts padded to shard * n_node

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(NODE_AXIS), P(DATA_AXIS)),
        out_specs=P(NODE_AXIS),
    )
    def _step(counts_shard, idx_shard):
        my_node = jax.lax.axis_index(NODE_AXIS)
        base = my_node * shard
        local = idx_shard - base
        ok = (idx_shard >= 0) & (local >= 0) & (local < shard)
        safe = jnp.where(ok, local, 0)
        acc = jnp.zeros_like(counts_shard).at[safe].add(ok.astype(counts_shard.dtype))
        return counts_shard + jax.lax.psum(acc, DATA_AXIS)

    return jax.jit(_step), shard


def pad_to_multiple(idx, multiple: int):
    """Pad an int32 index array with -1 so it splits evenly over devices."""
    import numpy as np

    n = len(idx)
    padded = -np.ones((-(-n // multiple)) * multiple or multiple, dtype=np.int32)
    padded[:n] = idx
    return padded

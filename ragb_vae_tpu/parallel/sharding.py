"""ZeRO-style sharding of optimizer state over the data axis.

Replaces DeepSpeed ZeRO-2 (reference configs/deepspeed_zero2.json,
rgba_vae_stage.py:251-262) the GSPMD way: instead of a C++ engine
partitioning gradients and optimizer state per rank, we annotate the
optax opt-state pytree with `NamedSharding`s that split each large leaf
across the data axis and let XLA insert the reduce-scatter/all-gather
collectives during compilation. Numerics are identical to the replicated
computation — only residency changes.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ragb_vae_tpu.parallel.mesh import DATA_AXIS

PyTree = Any

# Leaves smaller than this stay replicated: sharding tiny scalars/biases
# buys no memory and costs collective latency (DeepSpeed has the same idea
# via its allgather_bucket_size knobs).
DEFAULT_MIN_SHARD_SIZE = 2**16


def _spec_for_leaf(shape, axis_size: int, min_size: int) -> P:
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    # Prefer the leading dim; fall back to any dim divisible by the axis.
    for dim in range(len(shape)):
        if shape[dim] % axis_size == 0 and shape[dim] >= axis_size:
            spec = [None] * len(shape)
            spec[dim] = DATA_AXIS
            return P(*spec)
    return P()


def zero_sharding(
    tree: PyTree,
    mesh: Mesh,
    *,
    axis: str = DATA_AXIS,
    min_size: int = DEFAULT_MIN_SHARD_SIZE,
) -> PyTree:
    """NamedSharding pytree splitting each large leaf across `axis`.

    Works on concrete arrays or ShapeDtypeStructs; non-array leaves (e.g.
    optax count scalars) come back replicated.
    """
    axis_size = mesh.shape[axis]

    def leaf_sharding(leaf):
        shape = getattr(leaf, "shape", ())
        spec = _spec_for_leaf(tuple(shape), axis_size, min_size) if axis_size > 1 else P()
        if spec != P() and axis != DATA_AXIS:
            spec = P(*[axis if s == DATA_AXIS else s for s in spec])
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(leaf_sharding, tree)


def fsdp_sharding(
    tree: PyTree,
    mesh: Mesh,
    *,
    axis: str = DATA_AXIS,
    min_size: int = DEFAULT_MIN_SHARD_SIZE,
) -> PyTree:
    """FSDP/ZeRO-3-style parameter sharding: split each large weight across
    the data axis and let GSPMD insert the per-layer all-gathers at use
    sites. This is what makes FLUX-scale frozen bases (~12 GB bf16) fit on
    16 GB v5e chips during LoRA training — the reference relies on 80 GB
    GPUs and full DDP replication instead. Same leaf-splitting rule as the
    optimizer-state sharding (they are literally the same transformation
    applied to a different tree)."""
    return zero_sharding(tree, mesh, axis=axis, min_size=min_size)


def shard_tree(tree: PyTree, shardings: PyTree) -> PyTree:
    """device_put each leaf with its sharding (host->device or reshard)."""
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def replicated_tree(tree: PyTree, mesh: Mesh) -> PyTree:
    """All-replicated NamedSharding pytree matching `tree`'s structure."""
    rep = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: rep, tree)

"""Device mesh construction and canonical shardings.

TPU-native replacement for the reference's Accelerate/NCCL process-group
setup (rgba_vae_stage.py:251-268): one SPMD program over a
`jax.sharding.Mesh` instead of N processes with torch DDP. The default mesh
is 1-D ("data",) because data parallelism is the only model parallelism the
reference uses (SURVEY.md §2.2); extra axes can be added without touching
call sites that use the helpers below.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed for multi-host pods when requested.

    Gated on RAGB_MULTIHOST=1 (or an explicit coordinator env) because
    auto-detection misfires on tunneled single-chip setups. One process
    per host; afterwards jax.devices() spans the whole pod and the
    1-D data mesh covers every chip (ICI intra-slice, DCN across slices).
    """
    import os

    if not (
        os.environ.get("RAGB_MULTIHOST") == "1"
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    ):
        return False
    jax.distributed.initialize()
    return True


def create_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh over all (or the given) devices.

    With no `shape`, a 1-D mesh spanning every device. ICI carries the
    collectives inside a slice; a multi-slice job would put the slower DCN
    axis outermost — callers control that via `shape` ordering.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != len(devs):
        raise ValueError(f"Mesh shape {tuple(shape)} does not cover {len(devs)} devices.")
    grid = np.asarray(devs).reshape(shape)
    return Mesh(grid, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated across the mesh (params, scalars)."""
    return NamedSharding(mesh, P())


def pad_batch_to_mesh(batch_size: int, mesh: Mesh, axis: str = DATA_AXIS) -> int:
    """Smallest batch >= batch_size divisible by the data-axis size."""
    n = mesh.shape[axis]
    return -(-batch_size // n) * n


def shard_batch(arrays, mesh: Mesh, axis: str = DATA_AXIS):
    """device_put a pytree of host arrays with batch-dim sharding."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), arrays)


def put_global_batch(array, sharding, *, is_global: bool = False):
    """Place a data-parallel input batch on a (possibly multi-host) mesh.

    Single-process: plain device_put. Multi-process: `array` is this
    host's contiguous slice of the global batch (the loader's
    `process_shard` output) and the global jax.Array is assembled with
    `make_array_from_process_local_data` — no cross-host transfer, each
    host feeds only its own devices. With `is_global=True` the caller
    holds the IDENTICAL full batch on every host (e.g. an unsharded val
    loader with a shared seed) and this slices out the local rows first.

    Assumes the mesh's data axis enumerates devices in `jax.devices()`
    order (how `create_mesh` builds it), so process p's devices cover the
    contiguous row range [p*per, (p+1)*per) of the global batch.
    """
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    if is_global:
        if array.shape[0] % jax.process_count():
            raise ValueError(
                f"global batch {array.shape[0]} not divisible by "
                f"{jax.process_count()} processes"
            )
        per = array.shape[0] // jax.process_count()
        array = array[jax.process_index() * per : (jax.process_index() + 1) * per]
    return jax.make_array_from_process_local_data(sharding, array)

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


def _default_slice_id(device) -> int:
    """TPU slice id, falling back to the host process for CPU clusters."""
    sid = getattr(device, "slice_index", None)
    return int(sid) if sid is not None else int(device.process_index)


def slice_groups(devices=None, *, slice_key=None):
    """Devices grouped by TPU slice (DCN domain), each group id-ordered.

    On a multi-slice pod the groups are the ICI domains; on a multi-process
    CPU cluster (tests) they degenerate to per-process groups; single-host
    single-slice returns one group. `slice_key` overrides the grouping for
    tests (e.g. ``lambda d: d.id % 2`` fakes two slices on one host).
    """
    devs = list(devices) if devices is not None else jax.devices()
    key = slice_key or _default_slice_id
    groups: dict = {}
    for d in devs:
        groups.setdefault(key(d), []).append(d)
    return [groups[k] for k in sorted(groups)]


def create_hybrid_mesh(
    axis_names: Sequence[str],
    ici_shape: Sequence[int],
    dcn_shape: Sequence[int],
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    slice_key=None,
) -> Mesh:
    """Mesh whose every axis factors into DCN (cross-slice) x ICI
    (intra-slice) components, DCN outermost per axis.

    Axis k gets size ``dcn_shape[k] * ici_shape[k]``; any axis with
    ``dcn_shape[k] == 1`` is guaranteed intra-slice, so its collectives
    ride ICI only — the scaling-book layout rule the flat `create_mesh`
    reshape cannot express. The reference has no counterpart (its
    multi-node story is accelerate/NCCL over one flat world,
    /root/reference/README.md:74-77); this is the TPU-native multi-slice
    equivalent.

    On real multi-slice TPU hardware (devices expose `slice_index`)
    placement within each slice is delegated to
    `jax.experimental.mesh_utils.create_hybrid_device_mesh` for
    ICI-topology-aware ordering; elsewhere (CPU test clusters, fake
    `slice_key` groups) the grid is assembled per-slice in device-id
    order, which keeps process p's data rows contiguous — the
    `put_global_batch` contract.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if len(axis_names) != len(ici_shape) or len(axis_names) != len(dcn_shape):
        raise ValueError(
            f"axis_names/ici_shape/dcn_shape rank mismatch: "
            f"{tuple(axis_names)} vs {tuple(ici_shape)} vs {tuple(dcn_shape)}"
        )
    groups = slice_groups(devs, slice_key=slice_key)
    n_slices = len(groups)
    per_slice = len(groups[0])
    if any(len(g) != per_slice for g in groups):
        raise ValueError(
            f"uneven slices: {[len(g) for g in groups]} devices per slice"
        )
    if int(np.prod(dcn_shape)) != n_slices:
        raise ValueError(f"dcn shape {tuple(dcn_shape)} != {n_slices} slices")
    if int(np.prod(ici_shape)) != per_slice:
        raise ValueError(
            f"ici shape {tuple(ici_shape)} != {per_slice} devices per slice"
        )

    if (
        slice_key is None
        and n_slices > 1
        and all(getattr(d, "slice_index", None) is not None for d in devs)
        and getattr(devs[0], "platform", "") == "tpu"
    ):
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_hybrid_device_mesh(
                tuple(ici_shape), tuple(dcn_shape), devices=devs
            )
            return Mesh(grid, tuple(axis_names))
        except Exception as exc:  # fall through to the generic assembly
            print(f"[mesh] create_hybrid_device_mesh failed ({exc}); using id-order grid")

    full = np.empty(
        tuple(d * i for d, i in zip(dcn_shape, ici_shape)), dtype=object
    )
    for s, group in enumerate(groups):
        block = np.asarray(group, dtype=object).reshape(tuple(ici_shape))
        offset = np.unravel_index(s, tuple(dcn_shape))
        full[tuple(
            slice(o * i, (o + 1) * i) for o, i in zip(offset, ici_shape)
        )] = block
    return Mesh(full, tuple(axis_names))


def create_training_mesh(
    tp: int = 1,
    sp: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    slice_key=None,
) -> Mesh:
    """Data(+model)(+sp) mesh with the model/sp axes pinned inside a slice.

    Axes are ("data"[, "model"][, "sp"]) — the extra axes appear only when
    tp/sp > 1 so 1-D callers see the familiar data mesh. Data parallelism
    spans slices (DCN carries only the once-per-step gradient reduction)
    while the per-layer Megatron all-reduces (model) and the attention
    k/v all-gathers (sp) stay on ICI. Degenerates to a plain reshape on
    one slice.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    inner = [("model", tp), ("sp", sp)]
    for name, ways in inner:
        if ways < 1:
            raise ValueError(f"{name} ways must be >= 1, got {ways}")
    per_dev = tp * sp
    if n % per_dev:
        raise ValueError(
            f"tensor_parallel={tp} x sequence_parallel={sp} must divide "
            f"{n} devices"
        )
    axis_names = (DATA_AXIS,) + tuple(name for name, ways in inner if ways > 1)
    inner_shape = tuple(ways for _, ways in inner if ways > 1)
    groups = slice_groups(devs, slice_key=slice_key)
    per_slice = len(groups[0])
    if len(groups) == 1:
        return create_mesh((n // per_dev,) + inner_shape, axis_names, devices=devs)
    if per_slice % per_dev:
        raise ValueError(
            f"tensor_parallel={tp} x sequence_parallel={sp} must divide the "
            f"{per_slice} devices of one slice (model/sp axes cannot span DCN)"
        )
    return create_hybrid_mesh(
        axis_names,
        ici_shape=(per_slice // per_dev,) + inner_shape,
        dcn_shape=(len(groups),) + (1,) * len(inner_shape),
        devices=devs,
        slice_key=slice_key,
    )


def create_dp_tp_mesh(
    tp: int,
    *,
    axis_names: Sequence[str] = (DATA_AXIS, "model"),
    devices: Optional[Sequence[jax.Device]] = None,
    slice_key=None,
) -> Mesh:
    """("data", "model") mesh with the model axis pinned inside a slice.

    Thin wrapper over `create_training_mesh(tp=tp)` kept for callers that
    want the two-axis serving layout; tp=1 still yields both axes here
    (the general builder drops size-1 axes instead).
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if tp < 1 or n % tp:
        raise ValueError(f"tensor_parallel={tp} must divide {n} devices")
    if tp > 1:
        return create_training_mesh(tp=tp, devices=devs, slice_key=slice_key)
    groups = slice_groups(devs, slice_key=slice_key)
    if len(groups) == 1:
        return create_mesh((n // tp, tp), axis_names, devices=devs)
    return create_hybrid_mesh(
        axis_names,
        ici_shape=(len(groups[0]), 1),
        dcn_shape=(len(groups), 1),
        devices=devs,
        slice_key=slice_key,
    )


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


import functools


@functools.lru_cache(maxsize=64)
def _assert_process_contiguous_rows(sharding, n_rows: int) -> None:
    """Fail loudly if this process's batch rows are not the contiguous
    range [p*per, (p+1)*per) of the global batch.

    `make_array_from_process_local_data` maps a process's addressable
    global slices IN GLOBAL ORDER onto the local data, so a
    non-contiguous data-axis layout (possible with exotic device orders,
    e.g. topology-reordered hybrid meshes) would silently permute the
    global batch. Training loss is permutation-invariant so that would
    be a SILENT mismatch only between per-sample outputs and host-side
    sample names (validation dumps) — raise instead.
    """
    p = jax.process_index()
    rows = set()
    for dev, idx in sharding.devices_indices_map((n_rows,)).items():
        if dev.process_index != p:
            continue
        sl = idx[0]
        start = 0 if sl.start is None else sl.start
        stop = n_rows if sl.stop is None else sl.stop
        rows.update(range(start, stop))
    per = n_rows // jax.process_count()
    expect = set(range(p * per, (p + 1) * per))
    if rows != expect:
        raise ValueError(
            f"process {p}'s devices own global batch rows {sorted(rows)}, "
            f"not the contiguous [{p * per}, {(p + 1) * per}) the sharded "
            "loader produced — this mesh's data-axis device order is not "
            "process-contiguous; build the mesh with parallel.create_mesh/"
            "create_hybrid_mesh (id-order assembly) or feed an is_global "
            "batch"
        )


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
    n_global = array.shape[0] * (1 if is_global else jax.process_count())
    _assert_process_contiguous_rows(sharding, n_global)
    if is_global:
        if array.shape[0] % jax.process_count():
            raise ValueError(
                f"global batch {array.shape[0]} not divisible by "
                f"{jax.process_count()} processes"
            )
        per = array.shape[0] // jax.process_count()
        array = array[jax.process_index() * per : (jax.process_index() + 1) * per]
    return jax.make_array_from_process_local_data(sharding, array)

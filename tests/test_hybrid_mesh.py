"""Hybrid ICI x DCN mesh construction (parallel.create_hybrid_mesh).

The reference's multi-node story is one flat NCCL world under accelerate
(/root/reference/README.md:74-77); the TPU-native equivalent must place
the model/sp axes INSIDE a slice so their per-layer collectives ride ICI
while only the once-per-step gradient reduction crosses DCN. These tests
fake slices on the 8-device CPU mesh via `slice_key` and pin:

- the grid layout (model axis never spans two slices; data rows are
  contiguous per slice — the `put_global_batch` contract),
- shape/unevenness validation errors,
- dp x tp LoRA grads parity on a hybrid-assembled mesh (same math as the
  flat mesh of test_dp_tp_training).
"""
import jax
import numpy as np
import pytest

from ragb_vae_tpu.parallel import (
    create_dp_tp_mesh,
    create_hybrid_mesh,
    create_mesh,
    slice_groups,
)

# fake two slices of 4 devices each on the 8-device CPU backend
FAKE2 = lambda d: d.id // 4
# fake four slices of 2
FAKE4 = lambda d: d.id // 2


def _slice_of(dev) -> int:
    return FAKE2(dev)


def test_slice_groups_single_and_fake():
    devs = jax.devices()
    assert len(slice_groups(devs)) == 1  # one process, no slice_index
    groups = slice_groups(devs, slice_key=FAKE2)
    assert [len(g) for g in groups] == [4, 4]
    assert [d.id for d in groups[0]] == [0, 1, 2, 3]


def test_hybrid_mesh_model_axis_intra_slice():
    mesh = create_hybrid_mesh(
        ("data", "model"), ici_shape=(2, 2), dcn_shape=(2, 1), slice_key=FAKE2
    )
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    grid = mesh.devices
    # every model-axis row lives in ONE slice
    for r in range(grid.shape[0]):
        assert len({_slice_of(d) for d in grid[r, :]}) == 1
    # data rows are slice-blocked: rows 0-1 slice 0, rows 2-3 slice 1
    assert [_slice_of(grid[r, 0]) for r in range(4)] == [0, 0, 1, 1]


def test_hybrid_mesh_2d_dcn_factorization():
    # dcn on BOTH axes: 4 fake slices of 2, mesh (data=4, model=2) with
    # dcn (2, 2) x ici (2, 1): the model axis crosses slices by request
    mesh = create_hybrid_mesh(
        ("data", "model"), ici_shape=(2, 1), dcn_shape=(2, 2), slice_key=FAKE4
    )
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    grid = mesh.devices
    # along data, positions (0,1) share a slice (ici block), (2,3) another
    assert FAKE4(grid[0, 0]) == FAKE4(grid[1, 0])
    assert FAKE4(grid[2, 0]) == FAKE4(grid[3, 0])
    assert FAKE4(grid[0, 0]) != FAKE4(grid[2, 0])
    # along model, the two columns are different slices (dcn_model=2)
    assert FAKE4(grid[0, 0]) != FAKE4(grid[0, 1])
    # all 8 devices appear exactly once
    assert sorted(d.id for d in grid.ravel()) == list(range(8))


def test_hybrid_mesh_validation_errors():
    with pytest.raises(ValueError, match="rank mismatch"):
        create_hybrid_mesh(("data",), (2, 2), (2,), slice_key=FAKE2)
    with pytest.raises(ValueError, match="!= 2 slices"):
        create_hybrid_mesh(("data",), ici_shape=(4,), dcn_shape=(1,), slice_key=FAKE2)
    with pytest.raises(ValueError, match="devices per slice"):
        create_hybrid_mesh(("data",), ici_shape=(2,), dcn_shape=(2,), slice_key=FAKE2)
    with pytest.raises(ValueError, match="uneven"):
        create_hybrid_mesh(
            ("data",), ici_shape=(4,), dcn_shape=(2,),
            slice_key=lambda d: 0 if d.id < 3 else 1,
        )


def test_dp_tp_mesh_single_slice_is_plain_reshape():
    mesh = create_dp_tp_mesh(2)
    flat = create_mesh((4, 2), ("data", "model"))
    assert [d.id for d in mesh.devices.ravel()] == [
        d.id for d in flat.devices.ravel()
    ]


def test_dp_tp_mesh_fake_slices_pins_model_inside():
    mesh = create_dp_tp_mesh(2, slice_key=FAKE2)
    grid = mesh.devices
    assert grid.shape == (4, 2)
    for r in range(4):
        assert len({_slice_of(d) for d in grid[r, :]}) == 1
    # tp wider than one slice must be refused, not silently spanned
    with pytest.raises(ValueError, match="cannot span DCN"):
        create_dp_tp_mesh(4, slice_key=FAKE4)


def test_create_training_mesh_axes_and_layout():
    from ragb_vae_tpu.parallel import create_training_mesh

    # 1-D degenerate: no extra axes appear
    assert dict(create_training_mesh().shape) == {"data": 8}
    # 3D single-slice: (data=2, model=2, sp=2)
    mesh = create_training_mesh(tp=2, sp=2)
    assert dict(mesh.shape) == {"data": 2, "model": 2, "sp": 2}
    assert sorted(d.id for d in mesh.devices.ravel()) == list(range(8))
    # fake slices: model AND sp stay inside one slice, data crosses
    mesh = create_training_mesh(tp=2, sp=2, slice_key=FAKE2)
    grid = mesh.devices
    for r in range(grid.shape[0]):
        assert len({_slice_of(d) for d in grid[r].ravel()}) == 1
    assert _slice_of(grid[0, 0, 0]) != _slice_of(grid[1, 0, 0])
    with pytest.raises(ValueError, match="cannot span DCN"):
        create_training_mesh(tp=2, sp=2, slice_key=FAKE4)
    with pytest.raises(ValueError, match="must divide"):
        create_training_mesh(tp=3)


def test_dp_tp_lora_grads_match_on_hybrid_mesh():
    """Same single-device grads parity as test_dp_tp_training, but on the
    hybrid slice-blocked grid rather than the flat reshape — pins that the
    device ORDER produced by the hybrid assembly is a valid GSPMD layout."""
    from tests.test_dp_tp_training import _run_sharded_parity

    mesh = create_hybrid_mesh(
        ("data", "model"), ici_shape=(1, 4), dcn_shape=(2, 1), slice_key=FAKE2
    )
    _run_sharded_parity(mesh, model_ways=4)

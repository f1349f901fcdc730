"""Optimizer-state host offload (ZeRO-Offload equivalent).

The reference's DeepSpeed config exposes `offload_optimizer.device`
(configs/deepspeed_zero2.json:5-7, set to "none" there); here
`training.optimizer_offload: true` parks the AdamW moments in pinned
host memory between steps — persistent HBM drops by 2x the param bytes.
Numerics are bit-identical: the update math is unchanged, only where the
state sleeps differs.

On this CPU mesh the step uses the portable boundary-transfer path
(compiled programs can't bind pinned_host buffers off-TPU); the TPU
fast path differs only in who schedules the DMAs (XLA inside the jit).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.models.losses import AlphaVaeLossConfig
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.parallel import create_mesh
from ragb_vae_tpu.training.vae_step import (
    VaeStepConfig,
    host_offload_shardings,
    init_train_state,
    make_optimizer,
    make_train_step,
)

# stage-level tests reuse the tiny-model fixtures from the stage suite
from tests.test_training_stage import data_tree, tiny_ckpt  # noqa: F401


def _arr_leaves(tree):
    return [a for a in jax.tree_util.tree_leaves(tree) if getattr(a, "ndim", 0) >= 1]


@pytest.fixture(scope="module")
def setup():
    config = AutoencoderConfig.tiny()
    config.in_channels = 4
    config.out_channels = 4
    model = RgbaVAE(config=config)
    params = model.init_params(jax.random.PRNGKey(0), image_size=32)
    mesh = create_mesh()
    tx = make_optimizer(1e-3, max_grad_norm=1.0)
    return model, params, mesh, tx


def _batch(n=8, size=32):
    rng = np.random.default_rng(0)
    return {"images": jnp.asarray(rng.random((n, size, size, 4), np.float32))}


def test_offloaded_state_lives_in_host_memory(setup):
    model, params, mesh, tx = setup
    opt = init_train_state(model, params, tx, mesh=mesh, offload=True)
    kinds = {a.sharding.memory_kind for a in _arr_leaves(opt)}
    assert kinds == {"pinned_host"}


def test_offload_matches_plain_step_exactly(setup):
    model, params, mesh, tx = setup
    loss_cfg = AlphaVaeLossConfig(reduce_mean=True)
    step_cfg = VaeStepConfig(kl_scale=1e-6)
    example = jax.eval_shape(tx.init, params)
    common = dict(mesh=mesh, opt_state_example=example, donate=False)

    plain = make_train_step(model, tx, loss_cfg, step_cfg, **common)
    off = make_train_step(
        model, tx, loss_cfg, step_cfg, offload_opt_state=True, **common
    )

    batch, key = _batch(), jax.random.PRNGKey(7)
    p_a, o_a = params, init_train_state(model, params, tx, mesh=mesh)
    p_b, o_b = params, init_train_state(model, params, tx, mesh=mesh, offload=True)
    for i in range(2):
        k = jax.random.fold_in(key, i)
        p_a, o_a, m_a = plain(p_a, o_a, batch, k)
        p_b, o_b, m_b = off(p_b, o_b, batch, k)
    # state stayed host-resident across steps
    assert {a.sharding.memory_kind for a in _arr_leaves(o_b)} == {"pinned_host"}
    # identical math: same loss, same params
    assert float(m_a["train/loss"]) == float(m_b["train/loss"])
    pa, pb = jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_b)
    assert all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(pa, pb))
    # moments agree too (modulo where they live)
    for x, y in zip(_arr_leaves(o_a), _arr_leaves(o_b)):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_host_offload_shardings_keeps_scalars_on_device(setup):
    model, params, mesh, tx = setup
    from ragb_vae_tpu.parallel import zero_sharding

    shapes = jax.eval_shape(tx.init, params)
    sh = zero_sharding(shapes, mesh)
    host = host_offload_shardings(sh, shapes)
    for s, ex in zip(jax.tree_util.tree_leaves(host), jax.tree_util.tree_leaves(shapes)):
        if getattr(ex, "ndim", 0) >= 1:
            assert s.memory_kind == "pinned_host"
        else:
            assert s.memory_kind in (None, "device")


def test_offload_requires_mesh(setup):
    model, params, _, tx = setup
    with pytest.raises(ValueError):
        init_train_state(model, params, tx, mesh=None, offload=True)


def test_stage_rejects_offload_with_shard_map(tiny_ckpt, data_tree, tmp_path):  # noqa: F811
    from ragb_vae_tpu.training.rgba_vae_stage import train_rgba_vae
    from tests.test_training_stage import _make_cfg

    cfg = _make_cfg(
        tiny_ckpt, data_tree, tmp_path, max_steps=1, run_validation=False,
        zero_impl="shard_map", optimizer_offload=True,
    )
    with pytest.raises(ValueError, match="optimizer_offload"):
        train_rgba_vae(cfg)


def test_stage_trains_with_offload(tiny_ckpt, data_tree, tmp_path):  # noqa: F811
    """End-to-end: training.optimizer_offload: true runs and checkpoints."""
    from ragb_vae_tpu.training.rgba_vae_stage import train_rgba_vae
    from tests.test_training_stage import _make_cfg

    cfg = _make_cfg(
        tiny_ckpt, data_tree, tmp_path, max_steps=2, run_validation=False,
        optimizer_offload=True,
    )
    metrics = train_rgba_vae(cfg)
    assert np.isfinite(metrics["train/loss"])
    assert (tmp_path / "ckpts" / "step_0000002" / "train_state.msgpack").exists()

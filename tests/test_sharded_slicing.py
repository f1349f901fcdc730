"""Mesh-aware slicing: numerics identical, per-device batch 1, grads flow."""
import jax
import jax.numpy as jnp
import numpy as np

from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.models.vae_tiling import sharded_sliced_apply
from ragb_vae_tpu.parallel import batch_sharding, create_mesh, replicated


def test_sharded_sliced_apply_matches_batched():
    mesh = create_mesh()
    x = jnp.asarray(np.random.default_rng(0).random((16, 4, 4, 2)), jnp.float32)
    fn = lambda v: v * 2.0 + jnp.mean(v, axis=(1, 2, 3), keepdims=True)

    out_ref = fn(x)
    sharded = jax.jit(
        lambda v: sharded_sliced_apply(fn, v, mesh, "data"),
        in_shardings=batch_sharding(mesh),
        out_shardings=batch_sharding(mesh),
    )(x)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(out_ref), rtol=1e-6)


def test_sharded_sliced_apply_small_batch_falls_back():
    mesh = create_mesh()
    x = jnp.ones((4, 2, 2, 1))  # n < devices -> plain call
    out = sharded_sliced_apply(lambda v: v + 1, x, mesh, "data")
    np.testing.assert_array_equal(np.asarray(out), 2.0)
    x9 = jnp.ones((9, 2, 2, 1))  # not divisible -> plain call
    out9 = sharded_sliced_apply(lambda v: v + 1, x9, mesh, "data")
    assert out9.shape == (9, 2, 2, 1)


def test_mesh_sliced_vae_encode_matches_batched():
    mesh = create_mesh()
    cfg = AutoencoderConfig.tiny()
    cfg.in_channels = 4
    cfg.out_channels = 4
    model = RgbaVAE(config=cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=16)
    x = jnp.asarray(np.random.default_rng(1).random((16, 16, 16, 4)), jnp.float32) * 2 - 1

    plain = model.encode(params, x)
    model.enable_slicing(mesh=mesh)
    try:
        enc = jax.jit(
            lambda p, v: model.encode(p, v).mean,
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
            out_shardings=batch_sharding(mesh),
        )
        sliced_mean = enc(params, x)
        np.testing.assert_allclose(
            np.asarray(sliced_mean), np.asarray(plain.mean), rtol=2e-5, atol=2e-5
        )
    finally:
        model.disable_slicing()


def test_mesh_sliced_encode_grads_flow():
    mesh = create_mesh()
    cfg = AutoencoderConfig.tiny()
    cfg.in_channels = 4
    cfg.out_channels = 4
    model = RgbaVAE(config=cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=16)
    x = jnp.asarray(np.random.default_rng(2).random((16, 16, 16, 4)), jnp.float32)

    model.enable_slicing(mesh=mesh)
    try:
        def loss(p, v):
            return jnp.mean(model.encode(p, v).mean ** 2)

        grads_sliced = jax.jit(
            jax.grad(loss),
            in_shardings=(replicated(mesh), batch_sharding(mesh)),
        )(params, x)
        model.disable_slicing()
        grads_plain = jax.jit(jax.grad(loss))(params, x)
        for a, b in zip(
            jax.tree_util.tree_leaves(grads_sliced), jax.tree_util.tree_leaves(grads_plain)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)
    finally:
        model.disable_slicing()

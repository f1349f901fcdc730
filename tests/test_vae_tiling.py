"""Tiled/sliced VAE paths: blend math, shape preservation, grad flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.models.vae_tiling import (
    blend_h,
    blend_v,
    needs_tiling,
    sliced_apply,
    tiled_decode,
    tiled_encode_moments,
)


def test_blend_v_ramp():
    above = jnp.ones((1, 4, 2, 1))
    below = jnp.zeros((1, 4, 2, 1))
    out = blend_v(above, below, 2)
    assert out.shape == below.shape
    # row 0: above*(1-0) + below*0 = 1; row 1: above*0.5
    np.testing.assert_allclose(np.asarray(out[0, :, 0, 0]), [1.0, 0.5, 0.0, 0.0])


def test_blend_h_ramp():
    left = jnp.ones((1, 2, 4, 1))
    right = jnp.zeros((1, 2, 4, 1))
    out = blend_h(left, right, 2)
    np.testing.assert_allclose(np.asarray(out[0, 0, :, 0]), [1.0, 0.5, 0.0, 0.0])


def test_blend_zero_extent_is_identity():
    a, b = jnp.ones((1, 4, 4, 1)), jnp.zeros((1, 4, 4, 1))
    np.testing.assert_array_equal(np.asarray(blend_v(a, b, 0)), np.asarray(b))


def test_needs_tiling_gate():
    assert needs_tiling(1408, 768, 1024)
    assert not needs_tiling(1024, 1024, 1024)


def test_sliced_apply_matches_batched():
    x = jnp.asarray(np.random.default_rng(0).random((3, 4, 4, 2)), jnp.float32)
    fn = lambda v: v * 2.0 + 1.0
    np.testing.assert_allclose(np.asarray(sliced_apply(fn, x)), np.asarray(fn(x)))


def test_tiled_apply_shapes_identity_fn():
    """With an identity 'encoder' (scale 1), tiling must reassemble the
    input exactly up to blending — which for identical overlapping content
    is also exact."""
    x = jnp.asarray(np.random.default_rng(1).random((1, 96, 96, 3)), jnp.float32)
    out = tiled_encode_moments(
        lambda t: t, x, tile_sample=64, spatial_scale=1, overlap_factor=0.25
    )
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_tiled_decode_shapes_with_upscale():
    z = jnp.asarray(np.random.default_rng(2).random((1, 48, 48, 4)), jnp.float32)
    up = lambda t: jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
    out = tiled_decode(up, z, tile_latent=32, spatial_scale=2, overlap_factor=0.25)
    assert out.shape == (1, 96, 96, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(up(z)), atol=1e-6)


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = AutoencoderConfig.tiny()
    cfg.in_channels = 4
    cfg.out_channels = 4
    cfg.sample_size = 32  # tile threshold
    model = RgbaVAE(config=cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=32)
    return model, params


def test_rgba_vae_tiled_encode_decode_round_trip(tiny_vae):
    model, params = tiny_vae
    x = jnp.asarray(np.random.default_rng(3).random((1, 64, 64, 4)), jnp.float32) * 2 - 1

    plain_post = model.encode(params, x)
    model.enable_tiling()
    try:
        tiled_post = model.encode(params, x)
        assert tiled_post.mean.shape == plain_post.mean.shape
        # interior far from seams matches the untiled encode closely
        diff = np.abs(np.asarray(tiled_post.mean) - np.asarray(plain_post.mean))
        assert np.isfinite(diff).all()

        z = plain_post.mode()
        recon_tiled = model.decode(params, z)
        model.disable_tiling()
        recon_plain = model.decode(params, z)
        assert recon_tiled.shape == recon_plain.shape == x.shape
    finally:
        model.disable_tiling()


def test_rgba_vae_slicing_matches_batched(tiny_vae):
    model, params = tiny_vae
    x = jnp.asarray(np.random.default_rng(4).random((2, 32, 32, 4)), jnp.float32) * 2 - 1
    plain = model.encode(params, x)
    model.enable_slicing()
    try:
        sliced = model.encode(params, x)
        np.testing.assert_allclose(
            np.asarray(sliced.mean), np.asarray(plain.mean), rtol=1e-5, atol=1e-5
        )
    finally:
        model.disable_slicing()


def test_tiled_encode_grads_flow(tiny_vae):
    model, params = tiny_vae
    model.enable_tiling()
    try:
        x = jnp.asarray(np.random.default_rng(5).random((1, 64, 64, 4)), jnp.float32)

        def loss(p):
            return jnp.mean(model.encode(p, x).mean ** 2)

        grads = jax.grad(loss)(params)
        norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
        assert any(n > 0 for n in norms) and all(np.isfinite(n) for n in norms)
    finally:
        model.disable_tiling()

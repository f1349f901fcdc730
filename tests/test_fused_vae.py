"""fused=True (whole-block kernels, XLA fallback on CPU) must match the
unfused model bit-for-bit in param tree and numerically in outputs."""
import jax
import jax.numpy as jnp
import numpy as np

from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.vae_config import AutoencoderConfig


def _tiny_config():
    return AutoencoderConfig(
        in_channels=4,
        out_channels=4,
        block_out_channels=(32, 64),
        layers_per_block=2,
        latent_channels=4,
        norm_num_groups=8,
        sample_size=64,
    )


def test_fused_param_tree_matches():
    cfg = _tiny_config()
    p_plain = RgbaVAE(config=cfg).init_params(jax.random.PRNGKey(0), image_size=32)
    p_fused = RgbaVAE(config=cfg, fused=True).init_params(jax.random.PRNGKey(0), image_size=32)
    flat_a = jax.tree_util.tree_structure(p_plain)
    flat_b = jax.tree_util.tree_structure(p_fused)
    assert flat_a == flat_b
    for a, b in zip(jax.tree_util.tree_leaves(p_plain), jax.tree_util.tree_leaves(p_fused)):
        assert a.shape == b.shape


def test_fused_forward_matches_unfused():
    cfg = _tiny_config()
    plain = RgbaVAE(config=cfg)
    fused = RgbaVAE(config=cfg, fused=True)
    params = plain.init_params(jax.random.PRNGKey(0), image_size=32)
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 4)), jnp.float32)
    key = jax.random.PRNGKey(1)
    r_plain, post_plain = plain.forward(params, x, key, sample=False)
    r_fused, post_fused = fused.forward(params, x, key, sample=False)
    np.testing.assert_allclose(np.asarray(r_plain), np.asarray(r_fused), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(post_plain.mean), np.asarray(post_fused.mean), rtol=1e-4, atol=1e-4
    )


def test_fused_grads_match_unfused():
    cfg = _tiny_config()
    plain = RgbaVAE(config=cfg)
    fused = RgbaVAE(config=cfg, fused=True)
    params = plain.init_params(jax.random.PRNGKey(0), image_size=32)
    x = jnp.asarray(np.random.default_rng(3).random((1, 32, 32, 4)), jnp.float32)
    key = jax.random.PRNGKey(1)

    def loss(model, p):
        recon, posterior = model.forward(p, x, key, sample=False)
        return jnp.mean((recon - x) ** 2) + 1e-6 * jnp.mean(posterior.kl())

    g_plain = jax.grad(lambda p: loss(plain, p))(params)
    g_fused = jax.grad(lambda p: loss(fused, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain), jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5)

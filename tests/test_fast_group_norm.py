"""FastGroupNorm vs reference fp32 GroupNorm numerics."""
import jax
import jax.numpy as jnp
import numpy as np

from ragb_vae_tpu.models.vae import FastGroupNorm


def _reference_gn(x, scale, bias, groups, eps=1e-6):
    b, h, w, c = x.shape
    xf = x.astype(np.float64).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    normed = ((xf - mean) / np.sqrt(var + eps)).reshape(b, h, w, c)
    return normed * scale + bias


def test_fast_group_norm_matches_reference_fp32():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32) * 3 + 1
    gn = FastGroupNorm(num_groups=4)
    params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    scale = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    params = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    out = gn.apply({"params": params}, jnp.asarray(x))
    ref = _reference_gn(x, scale, bias, 4)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_fast_group_norm_bf16_close_to_fp32():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 16, 16, 32)).astype(np.float32)
    params = {
        "scale": jnp.asarray(rng.standard_normal(32), jnp.float32),
        "bias": jnp.asarray(rng.standard_normal(32), jnp.float32),
    }
    out32 = FastGroupNorm(num_groups=8, dtype=jnp.float32).apply({"params": params}, jnp.asarray(x))
    out16 = FastGroupNorm(num_groups=8, dtype=jnp.bfloat16).apply(
        {"params": params}, jnp.asarray(x, jnp.bfloat16)
    )
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), rtol=0.05, atol=0.05
    )


def test_fast_group_norm_param_names_match_flax():
    """scale/bias names keep nn.GroupNorm/torch-import compatibility."""
    gn = FastGroupNorm(num_groups=2)
    params = gn.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))["params"]
    assert set(params.keys()) == {"scale", "bias"}
    assert params["scale"].shape == (8,)

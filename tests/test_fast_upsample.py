"""Subpixel Upsample (4x 2x2 convs + depth-to-space) vs literal nearest+conv3x3."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.models.vae import Upsample


@pytest.mark.parametrize("h,w,cin,cout", [(8, 8, 16, 16), (5, 7, 8, 12), (16, 8, 32, 16)])
def test_fast_upsample_matches_literal(h, w, cin, cout):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, h, w, cin)), jnp.float32)
    literal = Upsample(cout, fast=False)
    params = literal.init(jax.random.PRNGKey(1), x)["params"]
    out_lit, _ = literal.apply({"params": params}, x)

    fast = Upsample(cout, fast=True)
    # identical param structure -> same checkpoint loads into both
    fast_params = fast.init(jax.random.PRNGKey(2), x)["params"]
    assert jax.tree_util.tree_structure(fast_params) == jax.tree_util.tree_structure(params)
    out_fast, _ = fast.apply({"params": params}, x)

    assert out_fast.shape == out_lit.shape == (2, 2 * h, 2 * w, cout)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_lit), rtol=1e-5, atol=1e-5)


def test_fast_upsample_grads_match():
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 6, 6, 8)), jnp.float32)
    literal = Upsample(8, fast=False)
    params = literal.init(jax.random.PRNGKey(0), x)["params"]

    g_lit = jax.grad(lambda p: jnp.sum(literal.apply({"params": p}, x)[0] ** 2))(params)
    g_fast = jax.grad(
        lambda p: jnp.sum(Upsample(8, fast=True).apply({"params": p}, x)[0] ** 2)
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_fast), jax.tree_util.tree_leaves(g_lit)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

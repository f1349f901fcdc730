"""Fused GN-apply+SiLU+conv3x3 kernel vs XLA chain (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ragb_vae_tpu.ops.pallas.fused_gn_silu_conv as f


@pytest.fixture(autouse=True)
def _interpret():
    f.INTERPRET = True
    yield
    f.INTERPRET = False


def _inputs(h, w, c, n, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((h, w, c)), jnp.float32),
        jnp.asarray(rng.standard_normal(c) * 0.5 + 1.0, jnp.float32),
        jnp.asarray(rng.standard_normal(c) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal((3, 3, c, n)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize("h,w,c,n", [(32, 128, 128, 128), (16, 256, 128, 256)])
def test_fused_matches_xla_chain(h, w, c, n):
    x, a, b, wk, bias = _inputs(h, w, c, n)
    ours = f.fused_gn_silu_conv3x3(x, a, b, wk, bias, tile_h=8)
    ref = f._xla_ref(x, a, b, wk, bias)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_edges_are_zero_padded():
    """A constant input distinguishes zero-padding from edge replication."""
    c = 128
    x = jnp.ones((16, 128, c), jnp.float32)
    a = jnp.ones(c)
    b = jnp.zeros(c)
    wk = jnp.ones((3, 3, c, c), jnp.float32) * 0.01
    bias = jnp.zeros(c)
    ours = f.fused_gn_silu_conv3x3(x, a, b, wk, bias, tile_h=8)
    ref = f._xla_ref(x, a, b, wk, bias)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-4)
    # corners see 4 taps, edges 6, interior 9 -> strictly increasing
    corner = float(ours[0, 0, 0])
    edge = float(ours[0, 64, 0])
    interior = float(ours[8, 64, 0])
    assert corner < edge < interior


def test_unaligned_falls_back():
    x, a, b, wk, bias = _inputs(10, 12, 8, 8)
    out = f.fused_gn_silu_conv3x3(x, a, b, wk, bias)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(f._xla_ref(x, a, b, wk, bias)), rtol=1e-5, atol=1e-5
    )


def test_grads_match_chain():
    x, a, b, wk, bias = _inputs(16, 128, 128, 128, seed=3)
    g1 = jax.grad(
        lambda q, kw: jnp.sum(f.fused_gn_silu_conv3x3(q, a, b, kw, bias, tile_h=8) ** 2),
        argnums=(0, 1),
    )(x, wk)
    g2 = jax.grad(
        lambda q, kw: jnp.sum(f._xla_ref(q, a, b, kw, bias) ** 2), argnums=(0, 1)
    )(x, wk)
    for ours, ref in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-3, atol=1e-4)

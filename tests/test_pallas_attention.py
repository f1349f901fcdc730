"""Flash-attention kernel vs exact reference (interpret mode on CPU)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ragb_vae_tpu.ops.pallas.flash_attention as pa


@pytest.fixture(autouse=True)
def _interpret_mode():
    pa.INTERPRET = True
    yield
    pa.INTERPRET = False


def _ref_attention(q, k, v, sm_scale):
    logits = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * sm_scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", w.astype(v.dtype), v)


@pytest.mark.parametrize(
    "seq,block", [(256, 128), (300, 128), (128, 128)]
)
def test_flash_matches_reference(seq, block):
    rng = np.random.default_rng(0)
    bh, d = 2, 128
    q = jnp.asarray(rng.standard_normal((bh, seq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, seq, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, seq, d)), jnp.float32)
    scale = 1.0 / math.sqrt(d)
    out = pa.flash_attention_fwd_3d(q, k, v, sm_scale=scale, block_q=block, block_k=block)
    ref = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_handles_ragged_and_asymmetric_seqs():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 200, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 77, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 77, 64)), jnp.float32)
    scale = 1.0 / 8.0
    out = pa.flash_attention_fwd_3d(q, k, v, sm_scale=scale, block_q=128, block_k=128)
    ref = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_chunked_matches_reference_and_grads():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((2, 96, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 96, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 96, 32)), jnp.float32)
    scale = 1.0 / math.sqrt(32)
    out = pa.chunked_attention_3d(q, k, v, sm_scale=scale, chunk=32)
    ref = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def loss_chunked(q):
        return jnp.sum(pa.chunked_attention_3d(q, k, v, sm_scale=scale, chunk=32) ** 2)

    def loss_ref(q):
        return jnp.sum(_ref_attention(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_chunked)(q)
    g2 = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_custom_vjp_backward_matches_reference():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((1, 128, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 128, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 128, 64)), jnp.float32)
    scale = 1.0 / 8.0

    def loss_flash(q, k, v):
        return jnp.sum(pa._flash_attention_3d(q, k, v, scale, 128, 128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v, scale) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("seq_q,seq_k", [(256, 256), (300, 200), (120, 77)])
def test_fused_backward_multiblock_and_ragged(seq_q, seq_k):
    """The fused dQ/dK/dV kernels across block boundaries and pad masking."""
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((2, seq_q, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, seq_k, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, seq_k, 64)), jnp.float32)
    scale = 1.0 / 8.0
    g = jnp.asarray(rng.standard_normal((2, seq_q, 64)), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(pa._flash_attention_3d(q, k, v, scale, 128, 128) * g)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v, scale) * g)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


def test_fused_backward_bf16_dtypes():
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.standard_normal((1, 256, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 256, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 256, 128)), jnp.bfloat16)
    scale = 1.0 / math.sqrt(128)

    def loss(q, k, v):
        return jnp.sum(pa._flash_attention_3d(q, k, v, scale, 128, 128).astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(
        lambda q, k, v: jnp.sum(_ref_attention(q, k, v, scale).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(grads, ref):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=0.1, atol=0.5
        )


def test_attention_wrapper_4d_fallback():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((2, 3, 40, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 3, 40, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 3, 40, 16)), jnp.float32)
    out = pa.attention(q, k, v)  # CPU -> chunked path
    assert out.shape == q.shape
    ref = _ref_attention(
        q.reshape(6, 40, 16), k.reshape(6, 40, 16), v.reshape(6, 40, 16), 0.25
    ).reshape(2, 3, 40, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

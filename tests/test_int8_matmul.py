"""Fused int8 weight-dequant matmul kernel vs exact XLA fallback.

The kernel (ops/pallas/int8_matmul.py) backs the QDense int8 serving
path (models/flux_transformer.py) — the memory-capacity play that fits
full-scale FLUX.1 on one 16 GB chip.  Reference keeps bf16 weights and
relies on an 80 GB card (/root/reference/src/models/flux_kontext_textalpha.py:22-53),
so there is no torch counterpart to golden against; the contract here is
exact agreement between the Pallas kernel (interpret mode on CPU) and
the XLA epilogue fallback, which is itself pinned against the dequantize-
then-matmul definition within bf16 rounding.
"""
import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the package re-exports the function under the module's name, so bind
# the module itself explicitly
im = importlib.import_module("ragb_vae_tpu.ops.pallas.int8_matmul")


@pytest.fixture(autouse=True)
def _interpret_mode():
    im.INTERPRET = True
    im.enable(True)
    yield
    im.INTERPRET = False
    im.enable(False)


def _mk(rng, m, k, n, dtype):
    x = jnp.asarray(rng.standard_normal((m, k)), dtype)
    q = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    s = jnp.asarray(rng.random((n,)) * 0.02 + 1e-3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
    return x, q, s, b


@pytest.mark.parametrize("m,k,n", [(128, 128, 256), (256, 384, 512), (512, 256, 256)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_xla_epilogue(m, k, n, dtype):
    rng = np.random.default_rng(0)
    x, q, s, b = _mk(rng, m, k, n, dtype)
    out = im.int8_matmul(x, q, s, b)
    ref = im._xla_epilogue(x, q, s, b)
    assert out.dtype == dtype
    # identical contraction + one output rounding: equal up to blocked-k
    # accumulation order, so tolerances are at dtype epsilon scale
    tol = 1e-4 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=tol, atol=tol
    )


def test_xla_epilogue_matches_dequant_definition():
    # the fallback itself vs the naive dequantize-then-matmul definition
    rng = np.random.default_rng(1)
    x, q, s, b = _mk(rng, 64, 96, 80, jnp.float32)
    out = im._xla_epilogue(x, q, s, b)
    ref = x @ (q.astype(jnp.float32) * s[None, :]) + b[None, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_leading_dims_and_no_bias():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 128, 128)), jnp.float32)
    q = jnp.asarray(rng.integers(-127, 128, (128, 256)), jnp.int8)
    s = jnp.asarray(rng.random((256,)) * 0.02 + 1e-3, jnp.float32)
    out = im.int8_matmul(x, q, s)  # (2,128) leading dims fold to m=256
    ref = im._xla_epilogue(x, q, s, jnp.zeros((256,), jnp.float32))
    assert out.shape == (2, 128, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_untileable_shapes_fall_back():
    # m=100 has no block divisor -> exact XLA path, still correct
    rng = np.random.default_rng(3)
    x, q, s, b = _mk(rng, 100, 96, 80, jnp.float32)
    out = im.int8_matmul(x, q, s, b)
    ref = x @ (q.astype(jnp.float32) * s[None, :]) + b[None, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gradients_match_xla_transpose():
    # QLoRA trains THROUGH frozen int8 base layers: d/dx must flow; the
    # custom_vjp routes the backward through the exact XLA rules.
    rng = np.random.default_rng(4)
    x, q, s, b = _mk(rng, 128, 128, 256, jnp.float32)

    def loss_kernel(x, s, b):
        return jnp.sum(im.int8_matmul(x, q, s, b) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(im._xla_epilogue(x, q, s, b) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, s, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, s, b)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-4)


def test_disabled_routing_uses_fallback_everywhere():
    im.enable(False)
    rng = np.random.default_rng(5)
    x, q, s, b = _mk(rng, 128, 128, 256, jnp.float32)
    out = im.int8_matmul(x, q, s, b)
    ref = im._xla_epilogue(x, q, s, b)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

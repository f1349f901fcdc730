"""Pallas conv3x3 kernel vs lax.conv (interpret mode) + module interop."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

import ragb_vae_tpu.ops.pallas.conv3x3 as c3
from ragb_vae_tpu.models.vae import Conv3x3


@pytest.fixture(autouse=True)
def _interpret():
    c3.INTERPRET = True
    yield
    c3.INTERPRET = False


def _ref(x, w):
    return lax.conv_general_dilated(
        x[None], w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[0]


@pytest.mark.parametrize("h,w,cin,cout,th,tw", [
    (32, 256, 128, 128, 16, 128),
    (16, 128, 128, 256, 16, 128),
])
def test_kernel_matches_lax_conv(h, w, cin, cout, th, tw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((h, w, cin)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)
    ours = c3.conv3x3_same(x, wk, tile_h=th, tile_w=tw)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(_ref(x, wk)), rtol=1e-4, atol=1e-4)


def test_unaligned_shapes_fall_back():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((10, 12, 8)), jnp.float32)  # unaligned
    wk = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    out = c3.conv3x3_same(x, wk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, wk)), rtol=1e-5, atol=1e-5)


def test_batched_wrapper():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 16, 128, 128)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    out = c3.conv3x3_same_batched(x, wk)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(out[i]), np.asarray(_ref(x[i], wk)), rtol=1e-4, atol=1e-4
        )


def test_custom_vjp_grads_match():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((16, 128, 128)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, 128, 128)) * 0.05, jnp.float32)
    g1 = jax.grad(lambda a, b: jnp.sum(c3.conv3x3_same(a, b) ** 2), argnums=(0, 1))(x, wk)
    g2 = jax.grad(lambda a, b: jnp.sum(_ref(a, b) ** 2), argnums=(0, 1))(x, wk)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_conv3x3_module_matches_nn_conv():
    from flax import linen as nn

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 16, 128, 128)), jnp.float32)
    module = Conv3x3(128)
    params = module.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params.keys()) == {"kernel", "bias"}
    ref_mod = nn.Conv(128, (3, 3), padding=1)
    out = module.apply({"params": params}, x)
    ref = ref_mod.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)

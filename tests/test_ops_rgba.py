"""Unit tests for ops.rgba against hand values and torch-independent math."""
import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.ops import (
    blend_to_white,
    checkerboard,
    composite_over_background,
    composite_over_black,
    composite_over_checkerboard,
    composite_over_white,
    ensure_alpha,
    from_vae_range,
    to_vae_range,
)


def test_ensure_alpha_rgb_gets_opaque():
    x = jnp.zeros((2, 4, 4, 3))
    y = ensure_alpha(x)
    assert y.shape == (2, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(y[..., 3]), 1.0)


def test_ensure_alpha_rgba_passthrough():
    x = jnp.ones((1, 2, 2, 4)) * 0.5
    y = ensure_alpha(x)
    assert y is x


def test_ensure_alpha_bad_channels():
    with pytest.raises(ValueError):
        ensure_alpha(jnp.zeros((1, 2, 2, 2)))


def test_value_range_roundtrip():
    x = jnp.linspace(0, 1, 16).reshape(1, 2, 2, 4)
    np.testing.assert_allclose(np.asarray(from_vae_range(to_vae_range(x))), np.asarray(x), atol=1e-7)
    np.testing.assert_allclose(np.asarray(to_vae_range(jnp.array(0.5))), 0.0, atol=1e-7)


def test_composite_over_scalar_background():
    # A half-transparent red pixel over white: 0.5*red + 0.5*white
    rgba = jnp.array([[[[1.0, 0.0, 0.0, 0.5]]]])
    out = composite_over_white(rgba)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), [1.0, 0.5, 0.5], atol=1e-7)
    out_black = composite_over_black(rgba)
    np.testing.assert_allclose(np.asarray(out_black[0, 0, 0]), [0.5, 0.0, 0.0], atol=1e-7)


def test_composite_over_color_sequence():
    rgba = jnp.array([[[[0.2, 0.4, 0.6, 0.25]]]])
    out = composite_over_background(rgba, (1.0, 0.0, 0.5))
    expected = np.array([0.2, 0.4, 0.6]) * 0.25 + np.array([1.0, 0.0, 0.5]) * 0.75
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expected, atol=1e-6)


def test_composite_over_tensor_background():
    rng = np.random.default_rng(0)
    rgba = jnp.asarray(rng.uniform(size=(2, 3, 3, 4)).astype(np.float32))
    bg = jnp.asarray(rng.uniform(size=(2, 3, 3, 3)).astype(np.float32))
    out = composite_over_background(rgba, bg)
    a = np.asarray(rgba[..., 3:4])
    expected = np.asarray(rgba[..., :3]) * a + np.asarray(bg) * (1 - a)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_composite_rgb_input_ignores_background():
    rgb = jnp.full((1, 2, 2, 3), 0.3)
    out = composite_over_background(rgb, 0.9)
    np.testing.assert_allclose(np.asarray(out), 0.3, atol=1e-7)


def test_blend_to_white():
    rgba = jnp.array([[[[0.0, 0.0, 0.0, 0.0]]]])  # fully transparent -> white
    out = blend_to_white(rgba)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), [1.0, 1.0, 1.0, 1.0], atol=1e-7)


def test_checkerboard_pattern_values():
    c = np.asarray(checkerboard(32, 32, tile=16))
    assert c.shape == (32, 32, 3)
    assert c[0, 0, 0] == pytest.approx(0.1)
    assert c[0, 16, 0] == pytest.approx(1.0)
    assert c[16, 0, 0] == pytest.approx(1.0)
    assert c[16, 16, 0] == pytest.approx(0.1)


def test_composite_over_checkerboard_opaque_passthrough():
    rgba = jnp.concatenate(
        [jnp.full((1, 32, 32, 3), 0.42), jnp.ones((1, 32, 32, 1))], axis=-1
    )
    out = composite_over_checkerboard(rgba)
    np.testing.assert_allclose(np.asarray(out), 0.42, atol=1e-7)

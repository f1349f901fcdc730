"""RGBA compositing and value-range primitives (channels-last).

Behavioral parity with the reference implementation
(/root/reference/src/models/rgba_vae.py:25-92 and
/root/reference/src/training/rgba_vae_stage.py:628-687), re-expressed for
NHWC tensors. All functions are pure and jittable.

Conventions:
- images are (..., H, W, C) float arrays; RGBA is C=4, alpha in channel 3.
- pixel values live in [0, 1] unless a function says otherwise.
"""
from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp

Array = jnp.ndarray
Background = Union[float, int, Sequence[float], Array]


def ensure_alpha(x: Array) -> Array:
    """Append an opaque alpha channel when the input is RGB.

    Mirrors `_ensure_alpha` (reference rgba_vae.py:25-29): RGB inputs get
    alpha=1 so RGB and RGBA share one latent space.
    """
    if x.shape[-1] == 4:
        return x
    if x.shape[-1] != 3:
        raise ValueError(f"Expected 3 or 4 channels, got {x.shape[-1]}")
    alpha = jnp.ones(x.shape[:-1] + (1,), dtype=x.dtype)
    return jnp.concatenate([x, alpha], axis=-1)


def to_vae_range(x: Array) -> Array:
    """[0,1] -> [-1,1] (reference rgba_vae.py:32-33)."""
    return x * 2.0 - 1.0


def from_vae_range(x: Array) -> Array:
    """[-1,1] -> [0,1] (reference rgba_vae.py:36-37)."""
    return (x + 1.0) * 0.5


def _normalize_background(background: Background, reference: Array) -> Array:
    """Broadcast a background spec against a (..., H, W, 3) RGB reference.

    Accepts a scalar, a 3-sequence of per-channel values, or an array
    broadcastable to the reference (reference rgba_vae.py:40-72).
    """
    if isinstance(background, (int, float)):
        return jnp.full_like(reference, float(background))
    if isinstance(background, (list, tuple)):
        if len(background) != 3:
            raise ValueError("Background color sequence must contain exactly three values.")
        color = jnp.asarray(background, dtype=reference.dtype).reshape((1,) * (reference.ndim - 1) + (3,))
        return jnp.broadcast_to(color, reference.shape)
    bg = jnp.asarray(background, dtype=reference.dtype)
    if bg.ndim == reference.ndim and bg.shape[-1] == 1:
        bg = jnp.repeat(bg, 3, axis=-1)
    return jnp.broadcast_to(bg, reference.shape)


def composite_over_background(rgba: Array, background: Background) -> Array:
    """Alpha-composite (..., H, W, 4) over a background color/tensor -> RGB.

    `rgb * a + bg * (1 - a)` exactly as reference rgba_vae.py:75-84.
    """
    rgba = ensure_alpha(rgba)
    rgb = rgba[..., :3]
    alpha = rgba[..., 3:4]
    bg = _normalize_background(background, rgb)
    return rgb * alpha + bg * (1.0 - alpha)


def composite_over_white(rgba: Array) -> Array:
    """Reference rgba_vae.py:87-88."""
    return composite_over_background(rgba, 1.0)


def composite_over_black(rgba: Array) -> Array:
    """Reference rgba_vae.py:91-92."""
    return composite_over_background(rgba, 0.0)


def blend_to_white(rgba: Array) -> Array:
    """Blend RGBA onto white and reset alpha to 1 (RGBA -> opaque RGBA).

    Mirrors `_blend_to_white` (reference rgba_component_dataset.py:39-43).
    """
    rgb = rgba[..., :3]
    alpha = rgba[..., 3:4]
    blended = rgb * alpha + (1.0 - alpha)
    return jnp.concatenate([blended, jnp.ones_like(alpha)], axis=-1)


def checkerboard(height: int, width: int, *, tile: int = 16, dtype=jnp.float32) -> Array:
    """Light/dark checkerboard pattern (H, W, 3) in {0.1, 1.0}.

    Matches the visualization background used by the reference
    (rgba_vae_stage.py:675-683): `((y//tile + x//tile) % 2) * 0.9 + 0.1`.
    """
    y = jnp.arange(height).reshape(-1, 1)
    x = jnp.arange(width).reshape(1, -1)
    pattern = ((y // tile + x // tile) % 2).astype(dtype)
    pattern = pattern * 0.9 + 0.1
    return jnp.broadcast_to(pattern[..., None], (height, width, 3))


def composite_over_checkerboard(rgba: Array, *, tile: int = 16) -> Array:
    """Composite (..., H, W, 4) in [0,1] over a checkerboard (for viz grids)."""
    rgba = ensure_alpha(rgba)
    h, w = rgba.shape[-3], rgba.shape[-2]
    checker = checkerboard(h, w, tile=tile, dtype=rgba.dtype)
    return composite_over_background(rgba, checker)

"""AlphaVAE detail-augmentation triplet construction (channels-last).

Parity with `build_detail_augmented_triplet` and
`split_triplet_distribution` (reference rgba_vae_stage.py:606-625,690-700).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def detail_augmented_triplet(target: Array) -> Array:
    """Stack (original, black-bg, white-bg) along the batch axis (3B, H, W, 4).

    `target` is RGBA in [-1, 1]. With a = alpha channel in [-1, 1]:
      fg = (1 + a) / 2,  bg = (1 - a) / 2
      black = target * fg - bg     (composites RGB over black)
      white = target * fg + bg    (composites RGB over white)
    and both composites get alpha := 1 (fully opaque).
    """
    if target.shape[-1] < 4:
        raise ValueError("detail augmentation expects RGBA tensors.")
    fg_alpha = (1.0 + target[..., 3:4]) * 0.5
    bg_alpha = (1.0 - target[..., 3:4]) * 0.5

    black = target * fg_alpha - bg_alpha
    white = target * fg_alpha + bg_alpha

    opaque = jnp.ones_like(target[..., 3:4])
    black = jnp.concatenate([black[..., :3], opaque], axis=-1)
    white = jnp.concatenate([white[..., :3], opaque], axis=-1)

    return jnp.concatenate([target, black, white], axis=0)


def split_triplet(x: Array) -> Tuple[Array, Array, Array]:
    """Split a (3B, ...) array back into (original, black, white) chunks."""
    if x.shape[0] % 3 != 0:
        raise ValueError("Batch dimension must be divisible by 3 for triplet splits.")
    a, b, c = jnp.split(x, 3, axis=0)
    return a, b, c

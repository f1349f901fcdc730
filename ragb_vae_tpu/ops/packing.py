"""Flux latent packing / unpacking and positional-id grids (channels-last).

Bit-faithful to `FluxPipeline._pack_latents`, `_unpack_latents`, and
`_prepare_latent_image_ids` as used by the reference
(flux_kontext_textalpha.py:334-349,387-390,468-471), re-derived for NHWC:

torch packs (B, C, H, W) -> (B, (H/2)(W/2), C*4) with token features ordered
channel-major: feature index = c*4 + hsub*2 + wsub. We preserve that exact
feature ordering so imported `x_embedder` weights line up.
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def pack_latents(latents: Array) -> Array:
    """(B, H, W, C) -> (B, (H/2)*(W/2), C*4) with 2x2 spatial patching.

    Feature ordering matches torch's channel-first pack: for each latent
    channel c, the 2x2 patch values in (row, col) order.
    """
    b, h, w, c = latents.shape
    if h % 2 or w % 2:
        raise ValueError(f"Latent spatial dims must be even, got {(h, w)}")
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    # (B, h2, hs, w2, ws, C) -> (B, h2, w2, C, hs, ws)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(tokens: Array, latent_height: int, latent_width: int) -> Array:
    """(B, N, C*4) -> (B, latent_height, latent_width, C). Inverse of pack."""
    b, n, f = tokens.shape
    h2, w2 = latent_height // 2, latent_width // 2
    if n != h2 * w2:
        raise ValueError(f"Token count {n} does not match latent dims {(latent_height, latent_width)}")
    c = f // 4
    x = tokens.reshape(b, h2, w2, c, 2, 2)
    # (B, h2, w2, C, hs, ws) -> (B, h2, hs, w2, ws, C)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, latent_height, latent_width, c)


def latent_dims_for_pixels(pixel_height: int, pixel_width: int, vae_scale_factor: int = 8):
    """Pixel dims -> even latent dims, matching diffusers' rounding.

    diffusers: latent_h = 2 * (pixel_h // (vae_scale_factor * 2)).
    """
    lh = 2 * (int(pixel_height) // (vae_scale_factor * 2))
    lw = 2 * (int(pixel_width) // (vae_scale_factor * 2))
    return lh, lw


def prepare_latent_image_ids(height: int, width: int, dtype=jnp.float32) -> Array:
    """RoPE position ids for a packed latent grid -> (height*width, 3).

    ids[:, 0] = 0, ids[:, 1] = row index, ids[:, 2] = column index —
    identical to FluxPipeline._prepare_latent_image_ids. `height`/`width`
    here are the *packed* grid dims (latent_dim // 2).
    """
    row = jnp.broadcast_to(jnp.arange(height, dtype=dtype)[:, None], (height, width))
    col = jnp.broadcast_to(jnp.arange(width, dtype=dtype)[None, :], (height, width))
    zeros = jnp.zeros((height, width), dtype=dtype)
    ids = jnp.stack([zeros, row, col], axis=-1)
    return ids.reshape(height * width, 3)

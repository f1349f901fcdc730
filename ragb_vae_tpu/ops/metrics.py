"""Validation metrics (PSNR, alpha MAE) — channels-last, jittable.

Parity: `compute_psnr` (reference rgba_vae_stage.py:712-715) and the alpha
MAE computation in `evaluate_rgba_vae` (reference rgba_vae_stage.py:749-753).
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def psnr(pred: Array, target: Array) -> Array:
    """Per-sample PSNR in dB over all non-batch axes -> (B,).

    mse clamped at 1e-8 like the reference to avoid -inf on perfect
    reconstructions.
    """
    axes = tuple(range(1, pred.ndim))
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2, axis=axes)
    mse = jnp.maximum(mse, 1e-8)
    return -10.0 * jnp.log10(mse)


def alpha_mae(pred_rgba: Array, target_rgba: Array) -> Array:
    """Per-sample mean absolute alpha error -> (B,). Channels-last RGBA."""
    diff = jnp.abs(pred_rgba[..., 3:].astype(jnp.float32) - target_rgba[..., 3:].astype(jnp.float32))
    axes = tuple(range(1, diff.ndim))
    return jnp.mean(diff, axis=axes)

"""AlphaVAE loss bundle (reconstruction Eq.9, KL, optional LPIPS).

Parity with the reference `AlphaVaeLoss` (losses.py:15-123) as pure jittable
functions plus a thin config dataclass. The training loop uses these — not
`RgbaVAE.loss` — exactly like the reference (rgba_vae_stage.py:333-339).

Channel priors Eb / Eb^2 default to the AlphaVAE paper values
(losses.py:34-37). All losses are computed in float32.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from ragb_vae_tpu.ops.gaussian import DiagonalGaussian

Array = jnp.ndarray

DEFAULT_EB: Tuple[float, float, float] = (-0.0357, -0.0811, -0.1797)
DEFAULT_EB2: Tuple[float, float, float] = (0.3163, 0.3060, 0.3634)


def reduce_loss(value: Array, *, reduce_mean: bool, weights: Optional[Array] = None) -> Array:
    """Reference `_reduce` (losses.py:117-123): plain mean, or per-sample sum
    over non-batch axes followed by batch mean.

    `weights` (B,) turns the batch mean into a weighted mean — used to make
    the loss exactly invariant to batch padding (zero-weight pad samples).
    With all-ones weights this is identical to the unweighted path.
    """
    if value.ndim == 0:
        return value
    flat = value.reshape(value.shape[0], -1)
    per_sample = jnp.mean(flat, axis=1) if reduce_mean else jnp.sum(flat, axis=1)
    if weights is None:
        return jnp.mean(per_sample)
    w = weights.astype(jnp.float32)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1e-8)


def alphavae_reconstruction_loss(
    pred: Array,
    target: Array,
    *,
    eb: Sequence[float] = DEFAULT_EB,
    eb2: Sequence[float] = DEFAULT_EB2,
    reduce_mean: bool = False,
    use_naive_mse: bool = False,
    weights: Optional[Array] = None,
) -> Array:
    """AlphaVAE Eq.(9) premultiplied reconstruction loss.

    `pred`/`target` are RGBA in [-1, 1], channels-last. With rgb and alpha
    mapped to [0,1] for alpha:
      d = t_rgb*t_a - p_rgb*p_a,   da = t_a - p_a
      loss = d^2 - 2*Eb*d*da + Eb^2*da^2    (per-channel priors Eb, Eb^2)
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if use_naive_mse:
        return reduce_loss((pred - target) ** 2, reduce_mean=reduce_mean, weights=weights)

    target_rgb = target[..., :3]
    pred_rgb = pred[..., :3]
    target_alpha = (target[..., 3:] + 1.0) * 0.5
    pred_alpha = (pred[..., 3:] + 1.0) * 0.5

    rgba_diff = target_rgb * target_alpha - pred_rgb * pred_alpha
    alpha_diff = target_alpha - pred_alpha

    eb_arr = jnp.asarray(eb, dtype=jnp.float32)
    eb2_arr = jnp.asarray(eb2, dtype=jnp.float32)
    loss = rgba_diff**2 - 2.0 * eb_arr * rgba_diff * alpha_diff + eb2_arr * alpha_diff**2
    return reduce_loss(loss, reduce_mean=reduce_mean, weights=weights)


def kl_loss(
    posterior: DiagonalGaussian,
    reference: Optional[DiagonalGaussian] = None,
    *,
    reduce_mean: bool = False,
    weights: Optional[Array] = None,
) -> Array:
    """KL (optionally against a frozen reference posterior), reference-reduced.

    posterior.kl() is already per-sample (B,), so both reduction modes
    collapse to a batch mean — kept explicit for parity with losses.py:109-115.
    """
    return reduce_loss(posterior.kl(reference), reduce_mean=reduce_mean, weights=weights)


def perceptual_composites(pred: Array, target: Array) -> Tuple[Array, Array, Array, Array]:
    """Black/white composites fed to LPIPS (losses.py:89-97). Inputs in [-1,1].

    Returns (pred_black, target_black, pred_white, target_white) — note these
    live in [0, 1]-ish premultiplied space exactly as the reference computes
    them (it feeds them to LPIPS unnormalized, a quirk we reproduce).
    """
    target_rgb = target[..., :3].astype(jnp.float32)
    pred_rgb = pred[..., :3].astype(jnp.float32)
    target_alpha = (target[..., 3:] + 1.0) * 0.5
    pred_alpha = (pred[..., 3:] + 1.0) * 0.5
    target_black = target_rgb * target_alpha
    pred_black = pred_rgb * pred_alpha
    target_white = target_black + (1.0 - target_alpha)
    pred_white = pred_black + (1.0 - pred_alpha)
    return pred_black, target_black, pred_white, target_white


@dataclasses.dataclass(frozen=True)
class AlphaVaeLossConfig:
    """Static configuration mirroring AlphaVaeLoss.__init__ (losses.py:24-48)."""

    reduce_mean: bool = False
    use_naive_mse: bool = False
    use_lpips: bool = False
    eb: Tuple[float, float, float] = DEFAULT_EB
    eb2: Tuple[float, float, float] = DEFAULT_EB2

    def __post_init__(self):
        if len(self.eb) != 3 or len(self.eb2) != 3:
            raise ValueError("eb/eb2 must each provide three channel weights.")

    def reconstruction_loss(
        self, pred: Array, target: Array, weights: Optional[Array] = None
    ) -> Array:
        return alphavae_reconstruction_loss(
            pred,
            target,
            eb=self.eb,
            eb2=self.eb2,
            reduce_mean=self.reduce_mean,
            use_naive_mse=self.use_naive_mse,
            weights=weights,
        )

    def kl_loss(
        self,
        posterior: DiagonalGaussian,
        reference: Optional[DiagonalGaussian] = None,
        weights: Optional[Array] = None,
    ) -> Array:
        return kl_loss(posterior, reference, reduce_mean=self.reduce_mean, weights=weights)

"""Diagonal Gaussian posterior used by KL-regularized autoencoders.

Functional equivalent of diffusers' `DiagonalGaussianDistribution`
(consumed by the reference at rgba_vae.py:277-278, losses.py:109-115,
rgba_vae_stage.py:690-700), channels-last and with explicit PRNG keys
instead of torch's implicit global RNG.

Parameter layout: `params` is (..., H, W, 2*C) with mean in the first C
channels and log-variance in the last C. Log-variance is clamped to
[-30, 20] exactly like diffusers.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


class DiagonalGaussian(NamedTuple):
    """Mean/log-variance pair with sampling and KL in float32."""

    mean: Array
    logvar: Array

    @classmethod
    def from_params(cls, params: Array) -> "DiagonalGaussian":
        mean, logvar = jnp.split(params, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return cls(mean=mean, logvar=logvar)

    @property
    def params(self) -> Array:
        return jnp.concatenate([self.mean, self.logvar], axis=-1)

    @property
    def std(self) -> Array:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> Array:
        return jnp.exp(self.logvar)

    def sample(self, key: jax.Array, dtype=None) -> Array:
        """Reparameterized sample: mean + std * eps."""
        dtype = dtype or self.mean.dtype
        eps = jax.random.normal(key, self.mean.shape, dtype=dtype)
        return self.mean.astype(dtype) + self.std.astype(dtype) * eps

    def mode(self) -> Array:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussian"] = None) -> Array:
        """KL divergence reduced over all non-batch axes -> (B,).

        Matches diffusers: 0.5 * sum(mean^2 + var - 1 - logvar) for the
        standard-normal prior, and the two-Gaussian form against `other`.
        Computed in float32 regardless of input dtype.
        """
        mean = self.mean.astype(jnp.float32)
        logvar = self.logvar.astype(jnp.float32)
        var = jnp.exp(logvar)
        axes = tuple(range(1, mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(mean**2 + var - 1.0 - logvar, axis=axes)
        o_mean = other.mean.astype(jnp.float32)
        o_logvar = other.logvar.astype(jnp.float32)
        o_var = jnp.exp(o_logvar)
        return 0.5 * jnp.sum(
            (mean - o_mean) ** 2 / o_var + var / o_var - 1.0 - logvar + o_logvar,
            axis=axes,
        )

    def nll(self, sample: Array) -> Array:
        """Negative log-likelihood per sample -> (B,) in float32."""
        logtwopi = jnp.log(2.0 * jnp.pi)
        mean = self.mean.astype(jnp.float32)
        logvar = self.logvar.astype(jnp.float32)
        var = jnp.exp(logvar)
        axes = tuple(range(1, mean.ndim))
        return 0.5 * jnp.sum(
            logtwopi + logvar + (sample.astype(jnp.float32) - mean) ** 2 / var,
            axis=axes,
        )


def split_batch(dist: DiagonalGaussian, parts: int) -> Tuple[DiagonalGaussian, ...]:
    """Split a posterior along the batch axis into `parts` equal chunks.

    Equivalent of `split_triplet_distribution` (reference
    rgba_vae_stage.py:690-700) generalized to any chunk count.
    """
    if dist.mean.shape[0] % parts != 0:
        raise ValueError(
            f"Posterior batch dimension {dist.mean.shape[0]} must be divisible by {parts}."
        )
    means = jnp.split(dist.mean, parts, axis=0)
    logvars = jnp.split(dist.logvar, parts, axis=0)
    return tuple(DiagonalGaussian(m, lv) for m, lv in zip(means, logvars))

"""FlowMatchEulerDiscreteScheduler — functional JAX port.

Semantics-parity with the diffusers scheduler the reference loads
(flux_kontext_textalpha.py:40-53, used at :242,:365-380,:490-495):
sigma schedule `t/N` with static shift `s*σ/(1+(s-1)σ)` or dynamic
exponential time-shift `e^μ/(e^μ + (1/σ - 1))`, timesteps = σ·N, Euler
update `x + (σ_next - σ)·v`. Schedule construction is host-side numpy
(it is tiny and static); the arrays drop straight into jitted code.
"""
from __future__ import annotations

import dataclasses
import json
import math
from pathlib import Path
from typing import Optional, Union

import numpy as np

Array = np.ndarray


@dataclasses.dataclass
class FlowMatchEulerConfig:
    """Mirrors scheduler_config.json of FLUX checkpoints."""

    num_train_timesteps: int = 1000
    shift: float = 3.0
    use_dynamic_shifting: bool = True
    base_shift: float = 0.5
    max_shift: float = 1.15
    base_image_seq_len: int = 256
    max_image_seq_len: int = 4096

    @classmethod
    def from_json(cls, path: Union[str, Path]) -> "FlowMatchEulerConfig":
        raw = json.loads(Path(path).read_text())
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})


def calc_mu(config: FlowMatchEulerConfig, seq_len: Optional[int]) -> Optional[float]:
    """Dynamic-shift μ from image sequence length (`_calc_mu`,
    flux_kontext_textalpha.py:257-278): linear interp between base/max
    shift over [base_seq, max_seq], seq_len clamped into that range."""
    if not config.use_dynamic_shifting:
        return None
    def _cfg(value, default):
        # explicit None check: 0 / 0.0 are legitimate config values that a
        # falsy `or` would silently replace with the default
        return default if value is None else value

    base_seq = _cfg(config.base_image_seq_len, 256)
    max_seq = _cfg(config.max_image_seq_len, 4096)
    base_shift = _cfg(config.base_shift, 0.5)
    max_shift = _cfg(config.max_shift, 1.15)
    if seq_len is None:
        seq_len = base_seq
    seq_len = max(min(int(seq_len), max_seq), base_seq)
    m = (max_shift - base_shift) / (max_seq - base_seq)
    b = base_shift - m * base_seq
    return float(seq_len * m + b)


def _time_shift_exponential(mu: float, sigma_pow: float, t: Array) -> Array:
    return math.exp(mu) / (math.exp(mu) + (1.0 / t - 1.0) ** sigma_pow)


def _static_shift(shift: float, sigmas: Array) -> Array:
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


class FlowMatchEulerScheduler:
    """Holds the (timesteps, sigmas) schedule; stateless step function.

    Unlike diffusers' mutable `_step_index` the Euler update takes the
    step index explicitly, so sampling loops are trivially jittable
    (`lax.fori_loop` over the index).
    """

    def __init__(self, config: Optional[FlowMatchEulerConfig] = None):
        self.config = config or FlowMatchEulerConfig()
        n = self.config.num_train_timesteps
        timesteps = np.linspace(1, n, n, dtype=np.float64)[::-1].copy()
        sigmas = timesteps / n
        if not self.config.use_dynamic_shifting:
            sigmas = _static_shift(self.config.shift, sigmas)
        self.sigma_min = float(sigmas[-1])
        self.sigma_max = float(sigmas[0])
        # Default full-resolution schedule (diffusers __init__ leaves no
        # trailing zero; set_timesteps appends it).
        self.timesteps = (sigmas * n).astype(np.float32)
        self.sigmas = sigmas.astype(np.float32)
        self.num_inference_steps: Optional[int] = None

    def set_timesteps(
        self,
        num_inference_steps: int,
        *,
        mu: Optional[float] = None,
    ) -> None:
        """Parity with diffusers set_timesteps(num, mu=mu)."""
        cfg = self.config
        n = cfg.num_train_timesteps
        timesteps = np.linspace(
            self.sigma_max * n, self.sigma_min * n, num_inference_steps, dtype=np.float64
        )
        sigmas = timesteps / n
        if cfg.use_dynamic_shifting:
            if mu is None:
                raise ValueError("use_dynamic_shifting requires `mu` in set_timesteps.")
            sigmas = _time_shift_exponential(mu, 1.0, sigmas)
        else:
            sigmas = _static_shift(cfg.shift, sigmas)
        self.timesteps = (sigmas * n).astype(np.float32)
        self.sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        self.num_inference_steps = num_inference_steps

    def step(self, model_output, step_index: int, sample):
        """Euler update: x_{i+1} = x_i + (σ_{i+1} − σ_i)·v. Jit-safe —
        works with traced arrays and integer step_index."""
        import jax.numpy as jnp

        if self.num_inference_steps is None:
            # the __init__ schedule carries no trailing sigma=0 (diffusers
            # appends it in set_timesteps); stepping it to the end would
            # gather sigmas[len] which XLA CLAMPS, silently turning the
            # final Euler update into a no-op and leaving ~1/N residual
            # noise. Require the inference schedule, like diffusers.
            raise ValueError(
                "Call set_timesteps(num_inference_steps, ...) before "
                "step(): the training-side __init__ schedule has no "
                "trailing sigma=0 to step onto."
            )
        sigmas = jnp.asarray(self.sigmas, dtype=jnp.float32)
        sigma = sigmas[step_index]
        sigma_next = sigmas[step_index + 1]
        # fp32 update like diffusers (sample upcast internally).
        prev = sample.astype(jnp.float32) + (sigma_next - sigma) * model_output.astype(jnp.float32)
        return prev.astype(sample.dtype)

    def scale_noise(self, sample, sigma, noise):
        """Forward process x_σ = (1−σ)·x₀ + σ·ε (training-side)."""
        return (1.0 - sigma) * sample + sigma * noise


# ---------------------------------------------------------------------------
# diffusers.training_utils ports (flux_kontext_textalpha.py:365-417)
# ---------------------------------------------------------------------------
def compute_density_for_timestep_sampling(
    key,
    batch_size: int,
    *,
    weighting_scheme: str = "logit_normal",
    logit_mean: float = 0.0,
    logit_std: float = 1.0,
    mode_scale: float = 1.29,
):
    """u ∈ (0,1) per sample; "logit_normal" = sigmoid(N(mean, std))."""
    import jax
    import jax.numpy as jnp

    if weighting_scheme == "logit_normal":
        u = jax.random.normal(key, (batch_size,)) * logit_std + logit_mean
        return jax.nn.sigmoid(u)
    if weighting_scheme == "mode":
        u = jax.random.uniform(key, (batch_size,))
        return 1.0 - u - mode_scale * (jnp.cos(jnp.pi * u / 2.0) ** 2 - 1.0 + u)
    return jax.random.uniform(key, (batch_size,))


def compute_loss_weighting_for_sd3(sigmas, *, weighting_scheme: str = "logit_normal"):
    """SD3 loss weight; any scheme other than sigma_sqrt/cosmap -> ones
    (so the reference's "logit_normal" weighting is identically 1)."""
    import jax.numpy as jnp

    if weighting_scheme == "sigma_sqrt":
        return sigmas**-2.0
    if weighting_scheme == "cosmap":
        bot = 1.0 - 2.0 * sigmas + 2.0 * sigmas**2
        return 2.0 / (jnp.pi * bot)
    return jnp.ones_like(sigmas)

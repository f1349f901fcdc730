"""RgbaVAE: RGBA-widened AutoencoderKL with the AlphaVAE training loss.

Public-API parity with the reference `RgbaVAE` (rgba_vae.py:194-341):
`from_pretrained_rgb`, `forward`, `loss`, `reconstruct`, plus the
compositing helpers re-exported from ops. JAX idiom: the class is a static
container (module + config + loss weights); parameters travel explicitly
and PRNG keys replace torch's implicit RNG.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ragb_vae_tpu.models.losses import (
    DEFAULT_EB,
    DEFAULT_EB2,
    alphavae_reconstruction_loss,
    reduce_loss,
)
from ragb_vae_tpu.models.vae import AutoencoderKL
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.models.weights import load_autoencoder_params
from ragb_vae_tpu.ops.gaussian import DiagonalGaussian
from ragb_vae_tpu.ops.rgba import (
    composite_over_black,
    composite_over_white,
    ensure_alpha,
    from_vae_range,
    to_vae_range,
)

Array = jnp.ndarray

__all__ = [
    "RgbaVAE",
    "composite_over_black",
    "composite_over_white",
]


@dataclasses.dataclass
class RgbaVAE:
    """Static wrapper; parameters are passed explicitly to every method."""

    config: AutoencoderConfig
    beta: float = 0.25
    alpha_loss_weight: float = 1.0
    alpha_l1_weight: float = 0.0
    rgb_loss_weight: float = 1.0
    white_bg_weight: float = 0.0
    black_bg_weight: float = 0.0
    loss_reduce_mean: bool = False
    use_naive_mse: bool = False
    eb: Tuple[float, float, float] = DEFAULT_EB
    eb2: Tuple[float, float, float] = DEFAULT_EB2
    dtype: jnp.dtype = jnp.float32
    remat: Union[bool, str] = False
    # fused=True: ResnetBlocks run as whole-block Pallas kernels with
    # stats/residual epilogues (ops/pallas/resnet_block.py) — the batched
    # single-chip fast path on TPU; param tree is unchanged.
    fused: bool = False
    # diffusers enable_tiling/enable_slicing equivalents (reference
    # rgba_vae_stage.py:296-304). Tiling bounds activation memory for
    # buckets above tile_sample_size; slicing processes one sample at a
    # time — on v5e that is the conv FAST path at high resolution
    # (benchmarks/results.md), and with a mesh it runs one sample PER
    # DEVICE per scan step (see enable_slicing).
    use_tiling: bool = False
    use_slicing: bool = False
    tile_sample_size: Optional[int] = None
    tile_overlap_factor: float = 0.25

    def __post_init__(self):
        if len(self.eb) != 3 or len(self.eb2) != 3:
            raise ValueError("custom_eb and custom_eb2 must each provide three channel weights.")
        self.module = AutoencoderKL(
            self.config, dtype=self.dtype, remat=self.remat, fused=self.fused
        )

    # diffusers-API-parity toggles
    def enable_tiling(self, tile_sample_size: Optional[int] = None) -> None:
        self.use_tiling = True
        if tile_sample_size is not None:
            self.tile_sample_size = tile_sample_size

    def disable_tiling(self) -> None:
        self.use_tiling = False

    def enable_slicing(self, mesh=None, axis: str = "data") -> None:
        """Per-sample slicing. With a `mesh`, slicing is mesh-aware: every
        device keeps one sample per scan step (per-device batch 1) instead
        of serializing the sharded batch axis."""
        self.use_slicing = True
        self._slicing_mesh = mesh
        self._slicing_axis = axis

    def disable_slicing(self) -> None:
        self.use_slicing = False
        self._slicing_mesh = None

    def enable_fused(self) -> None:
        """Whole-resnet-block Pallas kernels (ops/pallas/resnet_block.py) —
        the batched single-chip fast path on TPU. The param tree is
        unchanged, so this can be flipped on a constructed model (e.g.
        after from_pretrained). Mutually exclusive with slicing: fused
        kernels batch natively via their grid, and opaque kernels inside
        the lax.map slicing scan pipeline poorly (benchmarks/results.md)."""
        self.fused = True
        self.use_slicing = False
        self.module = AutoencoderKL(
            self.config, dtype=self.dtype, remat=self.remat, fused=True
        )

    def disable_fused(self) -> None:
        self.fused = False
        self.module = AutoencoderKL(
            self.config, dtype=self.dtype, remat=self.remat, fused=False
        )

    def _sliced(self, fn, x: Array) -> Array:
        from ragb_vae_tpu.models.vae_tiling import sharded_sliced_apply, sliced_apply

        mesh = getattr(self, "_slicing_mesh", None)
        if mesh is not None:
            return sharded_sliced_apply(fn, x, mesh, getattr(self, "_slicing_axis", "data"))
        return sliced_apply(fn, x)

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained_rgb(
        cls,
        model_name_or_path: str,
        subfolder: Optional[str] = "vae",
        *,
        alpha_bias_init: float = 0.0,
        beta: float = 0.25,
        alpha_loss_weight: float = 1.0,
        alpha_l1_weight: float = 0.0,
        rgb_loss_weight: float = 1.0,
        white_bg_weight: float = 0.0,
        black_bg_weight: float = 0.0,
        loss_reduce_mean: bool = False,
        use_naive_mse: bool = False,
        custom_eb: Optional[Sequence[float]] = None,
        custom_eb2: Optional[Sequence[float]] = None,
        dtype: jnp.dtype = jnp.float32,
        remat: Union[bool, str] = False,
    ) -> Tuple["RgbaVAE", dict]:
        """Load an RGB (or already-RGBA) checkpoint, widening to RGBA.

        Returns (model, params). Unlike the reference's
        ignore_mismatched_sizes + restore dance (rgba_vae.py:249-257), the
        load is deterministic: RGB convs are widened with an explicit
        zero-init alpha path; RGBA checkpoints load verbatim.
        """
        config, params = load_autoencoder_params(
            model_name_or_path,
            subfolder,
            adapt_to_rgba=True,
            alpha_bias_init=alpha_bias_init,
        )
        model = cls(
            config=config,
            beta=beta,
            alpha_loss_weight=alpha_loss_weight,
            alpha_l1_weight=alpha_l1_weight,
            rgb_loss_weight=rgb_loss_weight,
            white_bg_weight=white_bg_weight,
            black_bg_weight=black_bg_weight,
            loss_reduce_mean=loss_reduce_mean,
            use_naive_mse=use_naive_mse,
            eb=tuple(custom_eb) if custom_eb is not None else DEFAULT_EB,
            eb2=tuple(custom_eb2) if custom_eb2 is not None else DEFAULT_EB2,
            dtype=dtype,
            remat=remat,
        )
        return model, params

    def init_params(self, key: jax.Array, *, image_size: int = 64) -> dict:
        """Random init (for tests / training from scratch)."""
        c = self.config.in_channels
        x = jnp.zeros((1, image_size, image_size, c), dtype=jnp.float32)
        variables = self.module.init(key, x, jax.random.PRNGKey(0))
        return variables["params"]

    # ------------------------------------------------------------------
    # Forward paths (parity with rgba_vae.py:274-281,338-341)
    # ------------------------------------------------------------------
    def forward(self, params, x: Array, key: jax.Array, *, sample: bool = True):
        """[0,1] RGBA/RGB in -> ([0,1] clamped RGBA recon, posterior).

        Routed through encode/decode so tiling/slicing apply here too.
        """
        x_rgba = ensure_alpha(x)
        vae_input = to_vae_range(x_rgba).astype(self.dtype)
        posterior = self.encode(params, vae_input)
        z = (
            posterior.sample(key, dtype=self.dtype)
            if sample
            else posterior.mode().astype(self.dtype)
        )
        recon = self.decode(params, z)
        recon = jnp.clip(from_vae_range(recon.astype(jnp.float32)), 0.0, 1.0)
        return recon, posterior

    def __call__(self, params, x: Array, key: jax.Array):
        return self.forward(params, x, key)

    def encode(self, params, x_vae_range: Array) -> DiagonalGaussian:
        """Raw encode on [-1,1] inputs (the training loop's entry point).

        Honors tiling (moments blended across overlapping tiles, diffusers
        semantics) and slicing when enabled.
        """
        from ragb_vae_tpu.models.vae_tiling import needs_tiling, tiled_encode_moments

        def moments(v: Array) -> Array:
            return self.module.apply(
                {"params": params}, v, method=lambda m, t: m.encode(t).params
            )

        tile = self.tile_sample_size or self.config.sample_size
        fn = moments
        if self.use_tiling and needs_tiling(x_vae_range.shape[1], x_vae_range.shape[2], tile):
            fn = lambda v: tiled_encode_moments(
                moments,
                v,
                tile_sample=tile,
                spatial_scale=self.config.spatial_scale_factor,
                overlap_factor=self.tile_overlap_factor,
            )
        out = self._sliced(fn, x_vae_range) if self.use_slicing else fn(x_vae_range)
        return DiagonalGaussian.from_params(out)

    def decode(self, params, z: Array) -> Array:
        """Raw decode -> [-1,1] output (training loop's entry point)."""
        from ragb_vae_tpu.models.vae_tiling import needs_tiling, tiled_decode

        def dec(v: Array) -> Array:
            return self.module.apply({"params": params}, v, method=lambda m, t: m.decode(t))

        scale = self.config.spatial_scale_factor
        tile_latent = (self.tile_sample_size or self.config.sample_size) // scale
        fn = dec
        if self.use_tiling and needs_tiling(
            z.shape[1] * scale, z.shape[2] * scale, tile_latent * scale
        ):
            fn = lambda v: tiled_decode(
                dec,
                v,
                tile_latent=tile_latent,
                spatial_scale=scale,
                overlap_factor=self.tile_overlap_factor,
            )
        return self._sliced(fn, z) if self.use_slicing else fn(z)

    def reconstruct(self, params, x: Array, key: jax.Array) -> Array:
        recon, _ = self.forward(params, x, key)
        return recon

    # ------------------------------------------------------------------
    # Inline loss (parity with rgba_vae.py:283-336)
    # ------------------------------------------------------------------
    def loss(self, recon: Array, target: Array, posterior: DiagonalGaussian) -> Array:
        """Weighted sum of Eq.9 recon + bg-composite MSE + alpha MSE/L1 + beta*KL.

        `recon`/`target` in [0,1] like the reference's RgbaVAE.loss.
        """
        target_rgba = ensure_alpha(target).astype(jnp.float32)
        recon_rgba = ensure_alpha(recon).astype(jnp.float32)
        target_scaled = target_rgba * 2.0 - 1.0
        recon_scaled = recon_rgba * 2.0 - 1.0

        total = jnp.asarray(0.0, dtype=jnp.float32)
        if self.rgb_loss_weight > 0.0:
            if self.use_naive_mse:
                base = reduce_loss(
                    (recon_rgba[..., :3] - target_rgba[..., :3]) ** 2,
                    reduce_mean=self.loss_reduce_mean,
                )
            else:
                base = alphavae_reconstruction_loss(
                    recon_scaled,
                    target_scaled,
                    eb=self.eb,
                    eb2=self.eb2,
                    reduce_mean=self.loss_reduce_mean,
                )
            total = total + self.rgb_loss_weight * base

        if self.white_bg_weight > 0.0:
            total = total + self.white_bg_weight * jnp.mean(
                (composite_over_white(recon_rgba) - composite_over_white(target_rgba)) ** 2
            )
        if self.black_bg_weight > 0.0:
            total = total + self.black_bg_weight * jnp.mean(
                (composite_over_black(recon_rgba) - composite_over_black(target_rgba)) ** 2
            )
        if self.alpha_loss_weight > 0.0:
            total = total + self.alpha_loss_weight * jnp.mean(
                (recon_rgba[..., 3:] - target_rgba[..., 3:]) ** 2
            )
        if self.alpha_l1_weight > 0.0:
            total = total + self.alpha_l1_weight * jnp.mean(
                jnp.abs(recon_rgba[..., 3:] - target_rgba[..., 3:])
            )
        total = total + self.beta * jnp.mean(posterior.kl())
        return total

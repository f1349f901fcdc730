"""AutoencoderKL-compatible VAE in Flax (channels-last, TPU-native).

Architecture parity with the diffusers `AutoencoderKL` the reference wraps
(rgba_vae.py:249-255): conv_in -> DownEncoderBlock2D stacks
(ResnetBlock2D = GroupNorm+SiLU+Conv x2 with 1x1 shortcut) -> mid block with
single-head spatial attention -> GroupNorm+SiLU+conv_out producing
2*latent_channels Gaussian params; decoder mirrors. Module names line up
1:1 with diffusers state_dict paths so weight import is a mechanical
rename (see models/weights.py).

TPU-first choices:
- NHWC layout end-to-end; convs lower straight onto the MXU.
- GroupNorm statistics computed in float32 regardless of compute dtype.
- mid-block attention is query-chunked (exact softmax, bounded memory) so
  1024x1024 images (16k tokens at the 8x-downsampled mid block) never
  materialize a 16k x 16k logits matrix per head in one piece.
- optional rematerialization of resnet blocks replaces torch's
  `enable_gradient_checkpointing` (reference rgba_vae_stage.py:306-307).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.ops.gaussian import DiagonalGaussian

Array = jnp.ndarray


class FastGroupNorm(nn.Module):
    """GroupNorm with fp32 statistics and compute-dtype application.

    vs flax nn.GroupNorm(dtype=fp32): the input is reduced with fp32
    ACCUMULATION but never materialized in fp32 — the normalize collapses
    to one fused multiply-add `x*a + b` in the compute dtype with per-
    (batch, channel) coefficients, halving the HBM traffic of every norm
    layer in bf16 models (the VAE has ~60 of them on the 1024^2 path).
    Param names (scale/bias) match nn.GroupNorm for checkpoint interop.
    """

    num_groups: int
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        grouped = x.reshape(b, h * w, g, c // g)
        mean = jnp.mean(grouped, axis=(1, 3), dtype=jnp.float32)  # (B, g)
        meansq = jnp.mean(
            jnp.square(grouped.astype(jnp.float32)), axis=(1, 3), dtype=jnp.float32
        )
        var = meansq - jnp.square(mean)
        rstd = jax.lax.rsqrt(var + self.epsilon)  # (B, g)

        # fold (mean, rstd, scale, bias) into per-(B, C) a, b coefficients
        rstd_c = jnp.repeat(rstd, c // g, axis=1)  # (B, C)
        mean_c = jnp.repeat(mean, c // g, axis=1)
        a = scale[None, :] * rstd_c
        bcoef = bias[None, :] - mean_c * a
        a = a.reshape(b, 1, 1, c).astype(self.dtype)
        bcoef = bcoef.reshape(b, 1, 1, c).astype(self.dtype)
        return x.astype(self.dtype) * a + bcoef


def _group_norm(num_groups: int, name: str, dtype=jnp.float32) -> "FastGroupNorm":
    # Stats in fp32 for bf16 stability; application stays in compute dtype.
    return FastGroupNorm(num_groups=num_groups, epsilon=1e-6, dtype=dtype, name=name)


def _stats_group_norm(x: Array, stats, num_groups: int, name: str, dtype) -> Array:
    """conv_norm_out, optionally seeded by a fused-kernel stats epilogue.

    With `stats` (the (B, 2, C) per-channel sum/sumsq the previous fused
    kernel emitted for free), GroupNorm collapses to ONE fused
    multiply-add — saving the full-resolution stats read FastGroupNorm
    would issue (a 2.1 GB pass at 1024^2 batch 8 on the decoder output).
    Identical coefficient math (fp32 stats -> a, b -> compute-dtype FMA);
    params are declared under the same name either way, so the param tree
    is unchanged. stats=None (non-fused path / broken chain) falls back
    to the plain FastGroupNorm."""
    if stats is None:
        return _group_norm(num_groups, name, dtype)(x)
    from ragb_vae_tpu.ops.pallas.resnet_block import stats_to_coeffs

    b, h, w, c = x.shape
    scale, bias = _GNParams(c, name=name)()
    a, bcoef = stats_to_coeffs(stats, scale, bias, num_groups, h * w)
    a = a.reshape(b, 1, 1, c).astype(dtype)
    bcoef = bcoef.reshape(b, 1, 1, c).astype(dtype)
    return x.astype(dtype) * a + bcoef


class Conv3x3(nn.Module):
    """3x3 stride-1 SAME conv via the Pallas implicit-GEMM kernel
    (ops/pallas/conv3x3.py) with automatic fallback. NOT wired into the
    model: the kernel beats XLA's emitter in isolation (+3-8%) but loses
    ~32% end-to-end because the opaque pallas call breaks XLA's
    norm/SiLU-into-conv producer fusions and adds an explicit pad pass
    (7.96 -> 5.38 img/s at 1024^2, benchmarks/results.md). Kept as the
    starting point for a FUSED pad+norm+act+conv kernel next round.
    nn.Conv-compatible params (kernel HWIO, bias)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ragb_vae_tpu.ops.pallas.conv3x3 import conv3x3_same_batched

        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        out = conv3x3_same_batched(x.astype(self.dtype), kernel.astype(self.dtype))
        return out + bias.astype(self.dtype)


class _GNParams(nn.Module):
    """GroupNorm scale/bias with nn.GroupNorm-compatible names/init."""

    channels: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        return scale, bias


class ResnetBlock(nn.Module):
    """GroupNorm -> SiLU -> Conv3x3 (x2) with additive (1x1-projected) skip.

    fused=True runs the WHOLE block as two Pallas kernel launches
    (ops/pallas/resnet_block.py): each kernel fuses GN-apply + SiLU +
    conv3x3 and, in its epilogue, the residual add and the per-channel
    (sum, sumsq) statistics of its own output — so the next GroupNorm's
    stats pass costs zero HBM traffic. `stats` accepts the previous
    block's epilogue stats; the return is (out, stats) so consecutive
    blocks chain (round-1's per-chain kernels lost end-to-end precisely
    because stats/residual stayed as separate XLA passes,
    benchmarks/results.md). The batch dimension is a grid axis — no
    per-sample lax.map needed, which also avoids XLA's batch>=2 fusion
    regression on composed blocks (benchmarks/block_cliff.py). The param
    tree matches the unfused module exactly, so checkpoints interchange.
    """

    out_channels: int
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array, stats: Optional[Array] = None):
        in_channels = x.shape[-1]
        if self.fused:
            from ragb_vae_tpu.ops.pallas.resnet_block import fused_resnet_block

            s1, g1 = _GNParams(in_channels, name="norm1")()
            k1, cb1 = _Conv3x3Params(self.out_channels, in_channels, name="conv1")()
            s2, g2 = _GNParams(self.out_channels, name="norm2")()
            k2, cb2 = _Conv3x3Params(self.out_channels, self.out_channels, name="conv2")()
            p = {
                "norm1": {"scale": s1, "bias": g1},
                "conv1": {"kernel": k1, "bias": cb1},
                "norm2": {"scale": s2, "bias": g2},
                "conv2": {"kernel": k2, "bias": cb2},
            }
            if in_channels != self.out_channels:
                ks, bs = _ConvParams(
                    (1, 1), self.out_channels, in_channels, name="conv_shortcut"
                )()
                p["conv_shortcut"] = {"kernel": ks, "bias": bs}
            return fused_resnet_block(
                x.astype(self.dtype), p, num_groups=self.num_groups, stats=stats
            )
        h = _group_norm(self.num_groups, "norm1", self.dtype)(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = _group_norm(self.num_groups, "norm2", self.dtype)(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x.astype(h.dtype) + h, None


class Downsample(nn.Module):
    """Stride-2 conv with the asymmetric (0,1)x(0,1) pad diffusers uses.

    fused=True runs the dense-GEMM Pallas kernel (XLA's stride-2 conv
    emitter measures ~32 TF/s on these shapes) and returns epilogue stats
    so the next level's first fused block skips its GN1 stats pass;
    __call__ then returns (y, stats)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array):
        if self.fused:
            from ragb_vae_tpu.ops.pallas.resnet_block import (
                fused_downsample_conv3x3_stats,
            )

            c = x.shape[-1]
            kernel, bias = _ConvParams(
                (3, 3), self.out_channels, c, name="conv"
            )()
            return fused_downsample_conv3x3_stats(
                x.astype(self.dtype), kernel.astype(self.dtype), bias
            )
        y = nn.Conv(
            self.out_channels,
            (3, 3),
            strides=(2, 2),
            padding=((0, 1), (0, 1)),
            dtype=self.dtype,
            name="conv",
        )(x)
        return y, None


class Upsample(nn.Module):
    """Nearest-neighbor 2x then conv3x3 (diffusers Upsample2D).

    Computed in subpixel form: because the nearest-upsampled image is
    piecewise-constant over 2x2 cells, the 3x3 conv at the large grid
    collapses to FOUR 2x2 convs on the SMALL grid (kernel taps that land
    in the same source cell just sum), interleaved back with
    depth-to-space. Identical math (weights re-associated only), but
    2.25x fewer MXU FLOPs and no 4x-upsampled intermediate in HBM —
    these are the decoder's three most expensive convs at 1024^2.
    MEASURED SLOWER on v5e (7.19 vs 7.96 img/s end-to-end at 1024^2):
    the four kernels each re-read the input and the 2x2 GEMMs have a
    4x-shallower contraction, so on this bandwidth-sensitive chip the
    literal formulation wins — fast=False is the default; the subpixel
    path stays available (and tested) for hardware where FLOPs dominate.
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    fast: bool = False
    # fused=True: the conv runs as the identity-activation fused kernel
    # with the stats epilogue; __call__ then returns (y, stats) so the
    # next level's first fused block skips its GN1 stats pass.
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array):
        b, h, w, c = x.shape
        if self.fused:
            from ragb_vae_tpu.ops.pallas.resnet_block import (
                fused_upsample_conv3x3_stats,
            )

            kernel, bias = _Conv3x3Params(self.out_channels, c, name="conv")()
            # subpixel kernel: reads the SMALL tensor (no 4x intermediate),
            # 2.25x fewer FLOPs; these are the decoder's biggest convs
            return fused_upsample_conv3x3_stats(
                x.astype(self.dtype), kernel.astype(self.dtype), bias
            )
        if not self.fast:
            up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            y = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(up)
            return y, None

        kernel, bias = _Conv3x3Params(self.out_channels, c, name="conv")()
        wk = kernel.astype(self.dtype)
        # taps landing in the same 2x2 source cell just sum:
        # output parity di=0 sees small rows (i-1 : W[0]) and (i : W[1]+W[2]);
        # di=1 sees (i : W[0]+W[1]) and (i+1 : W[2]); columns analogous.
        r0 = jnp.stack([wk[0], wk[1] + wk[2]], axis=0)  # (2, 3, c, out)
        r1 = jnp.stack([wk[0] + wk[1], wk[2]], axis=0)

        def col_combine(r: Array, dj: int) -> Array:
            if dj == 0:
                return jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)
            return jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)

        kernels = {
            (0, 0): col_combine(r0, 0),
            (0, 1): col_combine(r0, 1),
            (1, 0): col_combine(r1, 0),
            (1, 1): col_combine(r1, 1),
        }
        pads = {
            (0, 0): ((1, 0), (1, 0)),
            (0, 1): ((1, 0), (0, 1)),
            (1, 0): ((0, 1), (1, 0)),
            (1, 1): ((0, 1), (0, 1)),
        }
        x_c = x.astype(self.dtype)
        ys = {
            key: jax.lax.conv_general_dilated(
                x_c, kernels[key], (1, 1), pads[key],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            for key in kernels
        }
        inner0 = jnp.stack([ys[(0, 0)], ys[(0, 1)]], axis=3)  # (b, h, w, 2, C)
        inner1 = jnp.stack([ys[(1, 0)], ys[(1, 1)]], axis=3)
        y = jnp.stack([inner0, inner1], axis=2)  # (b, h, 2, w, 2, C)
        y = y.reshape(b, 2 * h, 2 * w, self.out_channels)
        return y + bias.astype(self.dtype), None


class _Conv3x3Params(nn.Module):
    """Declares kernel/bias with nn.Conv-compatible names/init under the
    scope name "conv" so checkpoints are interchangeable with the literal
    Upsample2D conv."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class _ConvParams(nn.Module):
    """nn.Conv-compatible kernel/bias declaration for any window shape."""

    window: Tuple[int, int]
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.window, self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class SpatialAttention(nn.Module):
    """Single-head spatial self-attention of the VAE mid block.

    Mirrors diffusers `Attention` with group_norm + to_q/to_k/to_v/to_out
    linears and a residual add.
    """

    channels: int
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        residual = x
        y = _group_norm(self.num_groups, "group_norm", self.dtype)(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(self.channels, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(self.channels, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(self.channels, dtype=self.dtype, name="to_v")(y)
        # Exact chunked XLA attention (bounded memory, no SxS logits) on
        # the SLICED path: the mid-block then runs inside the per-sample
        # lax.map scan, where opaque pallas calls pipeline poorly (8.37 vs
        # 7.96 img/s e2e at 1024^2, benchmarks/results.md). On the FUSED
        # path the model never runs under lax.map, so the flash kernel is
        # used like the Flux transformer does.
        from ragb_vae_tpu.ops.pallas import attention as fused_attention

        # force_xla=None lets the wrapper fall back to XLA off-TPU
        attn = fused_attention(
            q[:, None], k[:, None], v[:, None],
            force_xla=True if not self.fused else None,
        )[:, 0]
        out = nn.Dense(self.channels, dtype=self.dtype, name="to_out")(attn)
        return residual + out.reshape(b, h, w, c)


class MidBlock(nn.Module):
    channels: int
    num_groups: int = 32
    add_attention: bool = True
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array):
        x, stats = ResnetBlock(
            self.channels, self.num_groups, self.dtype, self.fused, name="resnets_0"
        )(x)
        if self.add_attention:
            # attention rewrites x -> epilogue stats no longer describe it
            x = SpatialAttention(
                self.channels, self.num_groups, self.dtype, self.fused,
                name="attention",
            )(x)
            stats = None
        x, stats = ResnetBlock(
            self.channels, self.num_groups, self.dtype, self.fused, name="resnets_1"
        )(x, stats)
        return x, stats


def _block_cls(remat, idx: int):
    """ResnetBlock class, optionally checkpoint-wrapped for block `idx`.

    remat=True/"all": checkpoint every resnet block — the reference's
    `enable_gradient_checkpointing` equivalent (full forward recompute in
    the backward, minimal activation memory).
    remat="half": checkpoint alternate blocks — half the backward
    recompute FLOPs for roughly half the activation saving; the sweet
    spot when full no-remat does not fit the HBM envelope
    (benchmarks/results.md round-5 MFU ruling).
    remat=False/"none": save everything.
    """
    if remat in (True, "all") or (remat == "half" and idx % 2 == 0):
        return nn.remat(ResnetBlock)
    return ResnetBlock


class Encoder(nn.Module):
    config: AutoencoderConfig
    dtype: jnp.dtype = jnp.float32
    remat: Union[bool, str] = False
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype)
        )
        n_blocks = len(cfg.block_out_channels)
        stats = None  # conv_in seeds the chain fresh
        bi = 0
        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x, stats = _block_cls(self.remat, bi)(
                    out_ch, cfg.norm_num_groups, self.dtype, self.fused,
                    name=f"down_blocks_{i}_resnets_{j}",
                )(x, stats)
                bi += 1
            if i < n_blocks - 1:
                # stays XLA even on the fused path: the dense-GEMM kernel
                # wins in isolation but loses e2e (9.24 vs 9.30 img/s b8 —
                # XLA fuses these stride-2 convs with their producers;
                # benchmarks/results.md round-2 downsample note)
                x, stats = Downsample(
                    out_ch, self.dtype, name=f"down_blocks_{i}_downsample"
                )(x)
        x, mid_stats = MidBlock(
            cfg.block_out_channels[-1],
            cfg.norm_num_groups,
            cfg.mid_block_add_attention,
            self.dtype,
            self.fused,
            name="mid_block",
        )(x)
        x = _stats_group_norm(
            x, mid_stats if self.fused else None, cfg.norm_num_groups,
            "conv_norm_out", self.dtype,
        )
        x = nn.silu(x).astype(self.dtype)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x


class Decoder(nn.Module):
    config: AutoencoderConfig
    dtype: jnp.dtype = jnp.float32
    remat: Union[bool, str] = False
    fused: bool = False

    @nn.compact
    def __call__(self, z: Array) -> Array:
        cfg = self.config
        reversed_channels = tuple(reversed(cfg.block_out_channels))
        z = nn.Conv(reversed_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            z.astype(self.dtype)
        )
        z, stats = MidBlock(
            reversed_channels[0],
            cfg.norm_num_groups,
            cfg.mid_block_add_attention,
            self.dtype,
            self.fused,
            name="mid_block",
        )(z)
        n_blocks = len(reversed_channels)
        bi = 0
        for i, out_ch in enumerate(reversed_channels):
            for j in range(cfg.layers_per_block + 1):
                z, stats = _block_cls(self.remat, bi)(
                    out_ch, cfg.norm_num_groups, self.dtype, self.fused,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(z, stats)
                bi += 1
            if i < n_blocks - 1:
                # fused Upsample re-seeds the chain from its conv epilogue
                z, stats = Upsample(
                    out_ch, self.dtype, fused=self.fused,
                    name=f"up_blocks_{i}_upsample",
                )(z)
        z = _stats_group_norm(
            z, stats if self.fused else None, cfg.norm_num_groups,
            "conv_norm_out", self.dtype,
        )
        z = nn.silu(z).astype(self.dtype)
        z = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(z)
        return z


class AutoencoderKL(nn.Module):
    """KL autoencoder with Gaussian posterior. NHWC in/out, values in [-1, 1]."""

    config: AutoencoderConfig
    dtype: jnp.dtype = jnp.float32
    remat: Union[bool, str] = False
    fused: bool = False

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype, self.remat, self.fused, name="encoder")
        self.decoder = Decoder(self.config, self.dtype, self.remat, self.fused, name="decoder")
        if self.config.use_quant_conv:
            self.quant_conv = nn.Conv(
                2 * self.config.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
            )
        if self.config.use_post_quant_conv:
            self.post_quant_conv = nn.Conv(
                self.config.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
            )

    def encode(self, x: Array) -> DiagonalGaussian:
        params = self.encoder(x)
        if self.config.use_quant_conv:
            params = self.quant_conv(params)
        return DiagonalGaussian.from_params(params)

    def decode(self, z: Array) -> Array:
        if self.config.use_post_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(self, x: Array, key: jax.Array, *, sample: bool = True):
        """Full forward: encode -> (sample | mode) -> decode.

        Returns (reconstruction in [-1, 1], posterior).
        """
        posterior = self.encode(x)
        z = posterior.sample(key, dtype=self.dtype) if sample else posterior.mode().astype(self.dtype)
        recon = self.decode(z)
        return recon, posterior

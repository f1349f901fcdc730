"""FluxTransformer2DModel-compatible DiT in Flax (TPU-native, NHWC tokens).

Architecture parity with the diffusers transformer the reference fine-tunes
(flux_kontext_textalpha.py:22-37 load, :394-403 call): packed-latent token
stream + text stream through `num_layers` double-stream blocks (joint
attention, AdaLayerNormZero modulation) then `num_single_layers`
single-stream blocks over the concatenated sequence, 3-axis RoPE from
(txt_ids, img_ids), combined timestep+guidance+pooled-text conditioning,
AdaLayerNormContinuous head.

TPU-first choices:
- bf16 compute with fp32 modulation/softmax/RMSNorm statistics.
- attention is one fused einsum chain per block (MXU-shaped: heads folded
  into batch); flash/pallas kernel slots in via `attention_fn`.
- LoRA is first-class: target projections are `LoraDense` layers that add
  a rank-r bypass `x@A@B * (alpha/r)` — no weight materialization, and
  the base/adapter split falls out of the param-tree paths (peft
  equivalent of add_lora_to_transformer, flux_kontext_textalpha.py:152-180).
- module names mirror torch state_dict paths (dots -> underscores) so
  weight import is mechanical (see flux_weights.py).
"""
from __future__ import annotations

import dataclasses
import json
import math
from pathlib import Path
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


@dataclasses.dataclass
class FluxTransformerConfig:
    """Mirrors FluxTransformer2DModel's config.json."""

    patch_size: int = 1
    in_channels: int = 64
    out_channels: Optional[int] = None
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = True
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_json(cls, path: Union[str, Path]) -> "FluxTransformerConfig":
        raw = json.loads(Path(path).read_text())
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: tuple(v) if isinstance(v, list) else v for k, v in raw.items() if k in known}
        return cls(**kwargs)

    @classmethod
    def tiny(cls) -> "FluxTransformerConfig":
        """Small config for tests."""
        return cls(
            in_channels=16,
            num_layers=2,
            num_single_layers=2,
            attention_head_dim=32,
            num_attention_heads=2,
            joint_attention_dim=32,
            pooled_projection_dim=16,
            guidance_embeds=True,
            axes_dims_rope=(8, 12, 12),
        )


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------
def timestep_embedding(
    t: Array,
    dim: int = 256,
    *,
    max_period: float = 10000.0,
    scale: float = 1000.0,
    flip_sin_to_cos: bool = True,
) -> Array:
    """diffusers get_timestep_embedding semantics (the pipeline passes
    timestep/1000; scale=1000 restores the raw range like the BFL repo)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


def rope_frequencies(
    ids: Array, axes_dims: Sequence[int], theta: float = 10000.0
) -> Tuple[Array, Array]:
    """3-axis rotary cos/sin from position ids (seq, len(axes_dims)).

    Per axis: freqs = pos ⊗ theta^(-2i/dim), repeated-interleaved to full
    dim (diffusers get_1d_rotary_pos_embed(use_real=True,
    repeat_interleave_real=True)); axes concatenated -> (seq, head_dim).
    Computed in float64-free fp32 (TPU has no f64; adequate for pos<=4096).
    """
    cos_parts, sin_parts = [], []
    pos = ids.astype(jnp.float32)
    for axis, dim in enumerate(axes_dims):
        freqs = 1.0 / (
            theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
        )
        angles = pos[:, axis : axis + 1] * freqs[None, :]  # (seq, dim/2)
        cos_parts.append(jnp.repeat(jnp.cos(angles), 2, axis=-1))
        sin_parts.append(jnp.repeat(jnp.sin(angles), 2, axis=-1))
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


def apply_rotary_emb(x: Array, cos: Array, sin: Array) -> Array:
    """Rotate adjacent pairs: out = x*cos + rot(x)*sin with
    rot(x0,x1) = (-x1, x0). `x` is (..., seq, head_dim); cos/sin (seq, head_dim)."""
    x_f32 = x.astype(jnp.float32)
    x_pairs = x_f32.reshape(*x.shape[:-1], -1, 2)
    x_rot = jnp.stack([-x_pairs[..., 1], x_pairs[..., 0]], axis=-1).reshape(x_f32.shape)
    return (x_f32 * cos + x_rot * sin).astype(x.dtype)


class QDense(nn.Module):
    """nn.Dense drop-in with optional weight-only int8 storage.

    weight_quant="none" replicates nn.Dense exactly — same param names
    ("kernel"/"bias"), same initializers, same RNG paths, so existing
    checkpoints, the torch-golden parity tests, and the 1160-key manifests
    are untouched.

    weight_quant="int8" stores `kernel_q` (int8, per-OUTPUT-channel
    symmetric) + `kernel_scale` (f32, (features,)) and dequantizes INSIDE
    the layer — w = q·scale materializes one layer's weights at a time, so
    full-scale FLUX.1 (11.9 B params, ~24 GB bf16) fits a 16 GB chip for
    inference at ~11.1 GiB of resident int8. Weight-only quantization
    (activations stay bf16/f32) is the memory-capacity play, deliberately
    distinct from the int8 MXU-throughput probe that benchmarks/results.md
    refuted for the VAE conv chains: here int8 is the *storage* format and
    the MXU still sees bf16 operands.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    weight_quant: str = "none"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        if self.weight_quant == "int8":
            kernel_q = self.param(
                "kernel_q", nn.initializers.zeros, (in_features, self.features), jnp.int8
            )
            scale = self.param(
                "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
            )
            # Per-OUTPUT-channel scale factors out of the dot:
            # x @ (q*s) == (x @ q) * s.  int8 magnitudes (<=127) are
            # exact in bf16, so the dot sees exact weights and the only
            # rounding is the output's (strictly fewer than dequantize-
            # then-matmul, which also rounds every weight).  Measured on
            # v5e (benchmarks/int8_dequant_probe.py): with the scale out
            # of the dot, XLA fuses the s8->bf16 convert into the dot's
            # operand load — 4.17 ms vs 4.35 resident-bf16 vs 4.81 the
            # old dequantize-into-dot at [1536x3072x12288].  Routed
            # through ops.pallas.int8_matmul (XLA epilogue by default;
            # an in-register Pallas variant, measured 8% slower here,
            # stays behind enable()); bias fuses into the epilogue.
            from ragb_vae_tpu.ops.pallas.int8_matmul import int8_matmul

            bias = (
                self.param(
                    "bias", nn.initializers.zeros, (self.features,), jnp.float32
                )
                if self.use_bias
                else None
            )
            return int8_matmul(x.astype(self.dtype), kernel_q, scale, bias)
        elif self.weight_quant == "none":
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (in_features, self.features),
                jnp.float32,
            )
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        else:
            raise ValueError(f"Unknown weight_quant mode {self.weight_quant!r}.")
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class LoraDense(nn.Module):
    """Dense with an optional rank-r LoRA bypass (peft-equivalent).

    y = x@W + b + (alpha/r) * (x@A)@B; A ~ N(0, 1/r), B = 0 so the
    adapter starts as identity (peft init_lora_weights="gaussian").
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 0.0
    weight_quant: str = "none"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = QDense(
            self.features, use_bias=self.use_bias, dtype=self.dtype,
            weight_quant=self.weight_quant, name="base",
        )(x)
        if self.lora_rank > 0:
            in_features = x.shape[-1]
            rank = self.lora_rank
            lora_a = self.param(
                "lora_a",
                nn.initializers.normal(stddev=1.0 / rank),
                (in_features, rank),
                jnp.float32,
            )
            lora_b = self.param(
                "lora_b", nn.initializers.zeros, (rank, self.features), jnp.float32
            )
            scaling = self.lora_alpha / rank
            bypass = (x @ lora_a.astype(self.dtype)) @ lora_b.astype(self.dtype)
            y = y + scaling * bypass
        return y


class MLPEmbedder(nn.Module):
    """linear_1 -> SiLU -> linear_2 (diffusers TimestepEmbedding /
    PixArtAlphaTextProjection with act_fn='silu')."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    weight_quant: str = "none"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = QDense(self.dim, dtype=self.dtype, weight_quant=self.weight_quant,
                   name="linear_1")(x)
        x = nn.silu(x)
        return QDense(self.dim, dtype=self.dtype, weight_quant=self.weight_quant,
                      name="linear_2")(x)


class CombinedTimestepEmbeddings(nn.Module):
    """timestep (+guidance) sinusoid MLPs + pooled-text MLP, summed."""

    config: FluxTransformerConfig
    dtype: jnp.dtype = jnp.float32
    weight_quant: str = "none"

    @nn.compact
    def __call__(self, timestep: Array, guidance: Optional[Array], pooled: Array) -> Array:
        dim = self.config.inner_dim
        mlp = lambda name: MLPEmbedder(
            dim, dtype=self.dtype, weight_quant=self.weight_quant, name=name
        )
        temb = mlp("timestep_embedder")(
            timestep_embedding(timestep).astype(self.dtype)
        )
        if self.config.guidance_embeds:
            if guidance is None:
                raise ValueError("guidance_embeds=True requires a guidance tensor.")
            temb = temb + mlp("guidance_embedder")(
                timestep_embedding(guidance).astype(self.dtype)
            )
        temb = temb + mlp("text_embedder")(pooled.astype(self.dtype))
        return temb


# ---------------------------------------------------------------------------
# Attention pieces
# ---------------------------------------------------------------------------
class RMSNorm(nn.Module):
    """Per-head-dim RMSNorm, fp32 statistics (diffusers RMSNorm, eps 1e-6)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        x_f32 = x.astype(jnp.float32)
        var = jnp.mean(x_f32**2, axis=-1, keepdims=True)
        normed = x_f32 * jax.lax.rsqrt(var + self.eps)
        return (normed * weight).astype(x.dtype)


def default_attention(q: Array, k: Array, v: Array) -> Array:
    """(B, H, S, D) attention: Pallas flash kernel on TPU (online softmax,
    no SxS logits), exact chunked XLA elsewhere — numerics match to bf16
    tolerance (tests/test_pallas_attention.py)."""
    from ragb_vae_tpu.ops.pallas import attention as fused_attention

    return fused_attention(q, k, v)


def exact_attention(q: Array, k: Array, v: Array) -> Array:
    """Reference (B, H, S, D) attention; softmax in fp32. Test oracle."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


AttentionFn = Callable[[Array, Array, Array], Array]


def _split_heads(x: Array, heads: int) -> Array:
    b, s, _ = x.shape
    return x.reshape(b, s, heads, -1).transpose(0, 2, 1, 3)


def _merge_heads(x: Array) -> Array:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


class JointAttention(nn.Module):
    """Double-stream joint attention (FluxAttnProcessor semantics):
    txt tokens are prepended to img tokens, RoPE over the joint sequence."""

    config: FluxTransformerConfig
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 0.0
    weight_quant: str = "none"
    attention_fn: AttentionFn = default_attention

    @nn.compact
    def __call__(self, img: Array, txt: Array, rope: Tuple[Array, Array]):
        cfg = self.config
        dim, heads, head_dim = cfg.inner_dim, cfg.num_attention_heads, cfg.attention_head_dim
        dense = lambda name: LoraDense(
            dim, dtype=self.dtype, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, weight_quant=self.weight_quant, name=name,
        )
        q = _split_heads(dense("to_q")(img), heads)
        k = _split_heads(dense("to_k")(img), heads)
        v = _split_heads(dense("to_v")(img), heads)
        q = RMSNorm(head_dim, name="norm_q")(q)
        k = RMSNorm(head_dim, name="norm_k")(k)

        tq = _split_heads(dense("add_q_proj")(txt), heads)
        tk = _split_heads(dense("add_k_proj")(txt), heads)
        tv = _split_heads(dense("add_v_proj")(txt), heads)
        tq = RMSNorm(head_dim, name="norm_added_q")(tq)
        tk = RMSNorm(head_dim, name="norm_added_k")(tk)

        q = jnp.concatenate([tq, q], axis=2)  # txt first
        k = jnp.concatenate([tk, k], axis=2)
        v = jnp.concatenate([tv, v], axis=2)
        cos, sin = rope
        q = apply_rotary_emb(q, cos, sin)
        k = apply_rotary_emb(k, cos, sin)

        out = _merge_heads(self.attention_fn(q, k, v))
        txt_seq = txt.shape[1]
        txt_out, img_out = out[:, :txt_seq], out[:, txt_seq:]
        img_out = dense("to_out_0")(img_out)
        txt_out = dense("to_add_out")(txt_out)
        return img_out, txt_out


class SingleAttention(nn.Module):
    """Single-stream attention: qkv + q/k RMSNorm, no output projection."""

    config: FluxTransformerConfig
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 0.0
    weight_quant: str = "none"
    attention_fn: AttentionFn = default_attention

    @nn.compact
    def __call__(self, x: Array, rope: Tuple[Array, Array]) -> Array:
        cfg = self.config
        dim, heads, head_dim = cfg.inner_dim, cfg.num_attention_heads, cfg.attention_head_dim
        dense = lambda name: LoraDense(
            dim, dtype=self.dtype, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, weight_quant=self.weight_quant, name=name,
        )
        q = RMSNorm(head_dim, name="norm_q")(_split_heads(dense("to_q")(x), heads))
        k = RMSNorm(head_dim, name="norm_k")(_split_heads(dense("to_k")(x), heads))
        v = _split_heads(dense("to_v")(x), heads)
        cos, sin = rope
        q = apply_rotary_emb(q, cos, sin)
        k = apply_rotary_emb(k, cos, sin)
        return _merge_heads(self.attention_fn(q, k, v))


class FeedForward(nn.Module):
    """net.0.proj -> GELU(tanh) -> net.2 (diffusers FeedForward 'gelu-approximate')."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 0.0
    weight_quant: str = "none"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        inner = self.dim * self.mult
        x = LoraDense(
            inner, dtype=self.dtype, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, weight_quant=self.weight_quant,
            name="net_0_proj",
        )(x)
        x = nn.gelu(x, approximate=True)
        return LoraDense(
            self.dim, dtype=self.dtype, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, weight_quant=self.weight_quant,
            name="net_2",
        )(x)


class AdaLayerNormZero(nn.Module):
    """silu(temb) -> Dense(n*dim); LayerNorm (no affine) modulated by the
    first (shift, scale); remaining chunks returned as gates."""

    dim: int
    n_chunks: int = 6
    dtype: jnp.dtype = jnp.float32
    weight_quant: str = "none"

    @nn.compact
    def __call__(self, x: Array, temb: Array):
        emb = QDense(
            self.n_chunks * self.dim, dtype=jnp.float32,
            weight_quant=self.weight_quant, name="linear",
        )(
            nn.silu(temb.astype(jnp.float32))
        )
        chunks = jnp.split(emb[:, None, :], self.n_chunks, axis=-1)
        shift, scale = chunks[0], chunks[1]
        normed = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=jnp.float32, name="norm"
        )(x)
        out = (normed * (1.0 + scale) + shift).astype(x.dtype)
        return (out, *[c.astype(x.dtype) for c in chunks[2:]])


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------
class FluxTransformerBlock(nn.Module):
    config: FluxTransformerConfig
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 0.0
    weight_quant: str = "none"
    attention_fn: AttentionFn = default_attention

    @nn.compact
    def __call__(self, img: Array, txt: Array, temb: Array, rope):
        cfg = self.config
        norm_img, gate_msa, shift_mlp, scale_mlp, gate_mlp = AdaLayerNormZero(
            cfg.inner_dim, dtype=self.dtype, weight_quant=self.weight_quant,
            name="norm1"
        )(img, temb)
        norm_txt, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = AdaLayerNormZero(
            cfg.inner_dim, dtype=self.dtype, weight_quant=self.weight_quant,
            name="norm1_context"
        )(txt, temb)

        attn_img, attn_txt = JointAttention(
            cfg, dtype=self.dtype, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, weight_quant=self.weight_quant,
            attention_fn=self.attention_fn, name="attn",
        )(norm_img, norm_txt, rope)

        img = img + gate_msa * attn_img
        norm2 = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=jnp.float32, name="norm2"
        )(img)
        norm2 = (norm2 * (1.0 + scale_mlp) + shift_mlp).astype(img.dtype)
        img = img + gate_mlp * FeedForward(
            cfg.inner_dim, dtype=self.dtype, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, weight_quant=self.weight_quant, name="ff",
        )(norm2)

        txt = txt + c_gate_msa * attn_txt
        norm2_c = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=jnp.float32,
            name="norm2_context",
        )(txt)
        norm2_c = (norm2_c * (1.0 + c_scale_mlp) + c_shift_mlp).astype(txt.dtype)
        txt = txt + c_gate_mlp * FeedForward(
            cfg.inner_dim, dtype=self.dtype, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, weight_quant=self.weight_quant,
            name="ff_context",
        )(norm2_c)
        return img, txt


class FluxSingleTransformerBlock(nn.Module):
    config: FluxTransformerConfig
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 0.0
    weight_quant: str = "none"
    attention_fn: AttentionFn = default_attention

    @nn.compact
    def __call__(self, x: Array, temb: Array, rope) -> Array:
        cfg = self.config
        residual = x
        norm_x, gate = AdaLayerNormZero(
            cfg.inner_dim, n_chunks=3, dtype=self.dtype,
            weight_quant=self.weight_quant, name="norm"
        )(x, temb)
        mlp = nn.gelu(
            QDense(cfg.inner_dim * 4, dtype=self.dtype,
                   weight_quant=self.weight_quant, name="proj_mlp")(norm_x),
            approximate=True,
        )
        attn_out = SingleAttention(
            cfg, dtype=self.dtype, lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha, weight_quant=self.weight_quant,
            attention_fn=self.attention_fn, name="attn",
        )(norm_x, rope)
        out = QDense(cfg.inner_dim, dtype=self.dtype,
                     weight_quant=self.weight_quant, name="proj_out")(
            jnp.concatenate([attn_out, mlp], axis=-1)
        )
        return residual + gate * out


# ---------------------------------------------------------------------------
# The transformer
# ---------------------------------------------------------------------------
class FluxTransformer2D(nn.Module):
    """Forward signature mirrors the diffusers call at
    flux_kontext_textalpha.py:394-403 (hidden_states are pre-packed
    latent tokens; ids carry no batch dim)."""

    config: FluxTransformerConfig
    dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 0.0
    weight_quant: str = "none"
    remat: bool = False
    attention_fn: AttentionFn = default_attention

    @nn.compact
    def __call__(
        self,
        hidden_states: Array,  # (B, img_seq, in_channels)
        encoder_hidden_states: Array,  # (B, txt_seq, joint_attention_dim)
        pooled_projections: Array,  # (B, pooled_projection_dim)
        timestep: Array,  # (B,) already divided by 1000
        img_ids: Array,  # (img_seq, 3)
        txt_ids: Array,  # (txt_seq, 3)
        guidance: Optional[Array] = None,  # (B,)
    ) -> Array:
        cfg = self.config
        img = QDense(cfg.inner_dim, dtype=self.dtype,
                     weight_quant=self.weight_quant, name="x_embedder")(
            hidden_states.astype(self.dtype)
        )
        txt = QDense(cfg.inner_dim, dtype=self.dtype,
                     weight_quant=self.weight_quant, name="context_embedder")(
            encoder_hidden_states.astype(self.dtype)
        )
        temb = CombinedTimestepEmbeddings(
            cfg, dtype=self.dtype, weight_quant=self.weight_quant,
            name="time_text_embed",
        )(
            timestep, guidance, pooled_projections
        )

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rope = rope_frequencies(ids, cfg.axes_dims_rope)

        double_cls = FluxTransformerBlock
        single_cls = FluxSingleTransformerBlock
        if self.remat:
            double_cls = nn.remat(double_cls, static_argnums=())
            single_cls = nn.remat(single_cls, static_argnums=())

        for i in range(cfg.num_layers):
            img, txt = double_cls(
                cfg, dtype=self.dtype, lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha, weight_quant=self.weight_quant,
                attention_fn=self.attention_fn,
                name=f"transformer_blocks_{i}",
            )(img, txt, temb, rope)

        x = jnp.concatenate([txt, img], axis=1)  # txt first
        for i in range(cfg.num_single_layers):
            x = single_cls(
                cfg, dtype=self.dtype, lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha, weight_quant=self.weight_quant,
                attention_fn=self.attention_fn,
                name=f"single_transformer_blocks_{i}",
            )(x, temb, rope)
        x = x[:, txt.shape[1] :]

        # AdaLayerNormContinuous head: silu(temb) -> Dense(2*dim) -> (scale, shift)
        emb = QDense(2 * cfg.inner_dim, dtype=jnp.float32,
                     weight_quant=self.weight_quant, name="norm_out_linear")(
            nn.silu(temb.astype(jnp.float32))
        )
        scale, shift = jnp.split(emb[:, None, :], 2, axis=-1)
        x = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=jnp.float32, name="norm_out"
        )(x)
        x = (x * (1.0 + scale) + shift).astype(self.dtype)
        out_channels = cfg.out_channels or cfg.in_channels
        return QDense(out_channels, dtype=self.dtype,
                      weight_quant=self.weight_quant, name="proj_out")(x)

"""Pipeline-parallel FLUX transformer (inference).

The third way to fit a model past one chip's HBM (with weight-only int8,
models/quantize.py, and tensor parallelism, parallel/tensor_parallel.py,
both of which it composes with): the 19 double + 38 single blocks are
split into contiguous stages, each stage's params live on ONE device, and
microbatches stream through the stages. Per boundary only the (B, S, C)
activation carrier moves (device-to-device copies ride ICI on a pod) —
no per-block collectives at all, which is what makes PP the right axis
when the interconnect, not HBM bandwidth, is the constraint.

Schedule: host-driven GPipe. Each stage is its own jitted program pinned
to its device; JAX's async dispatch overlaps stage s on microbatch m with
stage s-1 on microbatch m+1 automatically (the host never blocks until
the final gather), so the bubble is the standard (n_stages - 1) /
(n_microbatches + n_stages - 1).

Stage boundaries are FLOP-balanced: a double block costs ~2x a single
block (two streams of attention+MLP vs one fused stream), the embedders
ride stage 0 and the AdaLN head rides the last stage.

Exactness: stage composition is the SAME block modules with the SAME
global names, so stage param subtrees are key-selections of the full tree
and the pipelined forward is bit-identical to the monolithic
FluxTransformer2D.apply (tests/test_pipeline_parallel.py).
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ragb_vae_tpu.models.flux_transformer import (
    CombinedTimestepEmbeddings,
    FluxSingleTransformerBlock,
    FluxTransformerBlock,
    FluxTransformerConfig,
    QDense,
    rope_frequencies,
)

PyTree = Any
Array = jnp.ndarray


def stage_ranges(
    config: FluxTransformerConfig, n_stages: int
) -> List[Tuple[range, range]]:
    """FLOP-balanced contiguous (double_blocks, single_blocks) per stage.

    Blocks are laid out double-then-single (the model's execution order);
    a double block weighs 2 single blocks. Every stage gets at least one
    block; boundaries never split a block.
    """
    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1, got {n_stages}.")
    n_double, n_single = config.num_layers, config.num_single_layers
    if n_stages > n_double + n_single:
        raise ValueError(
            f"n_stages={n_stages} exceeds the {n_double + n_single} blocks."
        )
    weights = [2.0] * n_double + [1.0] * n_single
    total = sum(weights)
    # greedy cut: close a stage once its weight reaches the remaining average
    ranges: List[Tuple[range, range]] = []
    start = 0
    acc = 0.0
    remaining = total
    for idx, w in enumerate(weights):
        acc += w
        stages_left = n_stages - len(ranges)
        blocks_left = n_double + n_single - idx - 1
        if (acc >= remaining / stages_left and blocks_left >= stages_left - 1) or (
            blocks_left == stages_left - 1
        ):
            end = idx + 1
            d = range(min(start, n_double), min(end, n_double))
            s = range(max(start - n_double, 0), max(end - n_double, 0))
            ranges.append((d, s))
            remaining -= acc
            acc = 0.0
            start = end
            if len(ranges) == n_stages:
                break
    return ranges


class PipelineStage(nn.Module):
    """One contiguous slice of the FLUX transformer.

    The first stage embeds (x/context/time-text), every stage runs its
    block range, the last stage applies the AdaLN head. Block submodules
    reuse the GLOBAL block names, so this module's param tree is a key
    subset of FluxTransformer2D's.
    """

    config: FluxTransformerConfig
    double_blocks: Sequence[int]
    single_blocks: Sequence[int]
    is_first: bool
    is_last: bool
    dtype: jnp.dtype = jnp.float32
    weight_quant: str = "none"

    @nn.compact
    def __call__(
        self,
        img: Array,  # first stage: (B, S_img, in_channels) packed latents
        txt: Array,  # first stage: (B, S_txt, joint_attention_dim)
        temb: Array,  # first stage: ignored (pass zeros (B, inner_dim))
        pooled: Array,
        timestep: Array,
        guidance: Optional[Array],
        img_ids: Array,
        txt_ids: Array,
    ):
        cfg = self.config
        if self.is_first:
            img = QDense(cfg.inner_dim, dtype=self.dtype,
                         weight_quant=self.weight_quant, name="x_embedder")(
                img.astype(self.dtype)
            )
            txt = QDense(cfg.inner_dim, dtype=self.dtype,
                         weight_quant=self.weight_quant, name="context_embedder")(
                txt.astype(self.dtype)
            )
            temb = CombinedTimestepEmbeddings(
                cfg, dtype=self.dtype, weight_quant=self.weight_quant,
                name="time_text_embed",
            )(timestep, guidance, pooled)

        # rope is positional, cheap, and identical across stages — recompute
        # locally instead of shipping (S, D) cos/sin through every boundary
        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        rope = rope_frequencies(ids, cfg.axes_dims_rope)

        for i in self.double_blocks:
            img, txt = FluxTransformerBlock(
                cfg, dtype=self.dtype, weight_quant=self.weight_quant,
                name=f"transformer_blocks_{i}",
            )(img, txt, temb, rope)

        if self.single_blocks:
            x = jnp.concatenate([txt, img], axis=1)
            for i in self.single_blocks:
                x = FluxSingleTransformerBlock(
                    cfg, dtype=self.dtype, weight_quant=self.weight_quant,
                    name=f"single_transformer_blocks_{i}",
                )(x, temb, rope)
            txt, img = x[:, : txt.shape[1]], x[:, txt.shape[1] :]

        if self.is_last:
            emb = QDense(2 * cfg.inner_dim, dtype=jnp.float32,
                         weight_quant=self.weight_quant, name="norm_out_linear")(
                nn.silu(temb.astype(jnp.float32))
            )
            scale, shift = jnp.split(emb[:, None, :], 2, axis=-1)
            x = nn.LayerNorm(
                use_bias=False, use_scale=False, epsilon=1e-6, dtype=jnp.float32,
                name="norm_out_ln",
            )(img)
            x = (x * (1.0 + scale) + shift).astype(self.dtype)
            out_channels = cfg.out_channels or cfg.in_channels
            return QDense(out_channels, dtype=self.dtype,
                          weight_quant=self.weight_quant, name="proj_out")(x)
        return img, txt, temb


_FIRST_KEYS = ("x_embedder", "context_embedder", "time_text_embed")
_LAST_KEYS = ("norm_out_linear", "proj_out")


def split_transformer_params(
    params: PyTree, config: FluxTransformerConfig, n_stages: int
) -> List[PyTree]:
    """Key-select the full FluxTransformer2D tree into per-stage subtrees."""
    ranges = stage_ranges(config, n_stages)
    out: List[PyTree] = []
    for s, (dr, sr) in enumerate(ranges):
        sub = {}
        if s == 0:
            for k in _FIRST_KEYS:
                if k in params:
                    sub[k] = params[k]
        if s == n_stages - 1:
            for k in _LAST_KEYS:
                if k in params:
                    sub[k] = params[k]
        for i in dr:
            sub[f"transformer_blocks_{i}"] = params[f"transformer_blocks_{i}"]
        for i in sr:
            sub[f"single_transformer_blocks_{i}"] = params[
                f"single_transformer_blocks_{i}"
            ]
        out.append(sub)
    return out


class PipelinedFluxTransformer:
    """The FLUX transformer as an n-device pipeline.

    Drop-in for the monolithic forward at the host level:

        pipe = PipelinedFluxTransformer(config, devices=jax.devices()[:4])
        stage_params = pipe.place_params(full_tree)   # one subtree/device
        out = pipe(stage_params, hidden_states=..., ..., microbatch=2)

    Each stage is jitted once per input shape and pinned to its device;
    microbatches are dispatched asynchronously so stages overlap.
    """

    def __init__(
        self,
        config: FluxTransformerConfig,
        devices: Sequence[Any],
        *,
        dtype: jnp.dtype = jnp.float32,
        weight_quant: str = "none",
    ) -> None:
        if len(devices) < 1:
            raise ValueError("Need at least one device.")
        self.config = config
        self.devices = list(devices)
        self.n_stages = len(self.devices)
        self.dtype = dtype
        ranges = stage_ranges(config, self.n_stages)
        self.stages = [
            PipelineStage(
                config=config,
                double_blocks=tuple(dr),
                single_blocks=tuple(sr),
                is_first=(s == 0),
                is_last=(s == self.n_stages - 1),
                dtype=dtype,
                weight_quant=weight_quant,
            )
            for s, (dr, sr) in enumerate(ranges)
        ]
        self._fns = [
            jax.jit((lambda stage: lambda p, *a: stage.apply({"params": p}, *a))(stage))
            for stage in self.stages
        ]

    def place_params(self, params: PyTree) -> List[PyTree]:
        subtrees = split_transformer_params(params, self.config, self.n_stages)
        return [
            jax.device_put(sub, dev) for sub, dev in zip(subtrees, self.devices)
        ]

    def __call__(
        self,
        stage_params: List[PyTree],
        *,
        hidden_states: Array,
        encoder_hidden_states: Array,
        pooled_projections: Array,
        timestep: Array,
        img_ids: Array,
        txt_ids: Array,
        guidance: Optional[Array] = None,
        microbatch: int = 1,
    ) -> Array:
        b = hidden_states.shape[0]
        if b % microbatch:
            raise ValueError(f"batch {b} not divisible by microbatch {microbatch}.")
        n_mb = b // microbatch

        def run_mb(mb: int) -> Array:
            sl = slice(mb * microbatch, (mb + 1) * microbatch)
            temb0 = jnp.zeros((microbatch, self.config.inner_dim), self.dtype)
            carrier = (hidden_states[sl], encoder_hidden_states[sl], temb0)
            pooled = pooled_projections[sl]
            ts = timestep[sl]
            g = None if guidance is None else guidance[sl]
            for s, (fn, p, dev) in enumerate(
                zip(self._fns, stage_params, self.devices)
            ):
                # the stage-boundary transfer: the carrier hops to stage s's
                # device (ICI on a pod); params are already resident there,
                # so the jitted stage runs on dev without a device pin
                carrier = jax.device_put(carrier, dev)
                res = fn(
                    p, *carrier,
                    jax.device_put(pooled, dev),
                    jax.device_put(ts, dev),
                    None if g is None else jax.device_put(g, dev),
                    jax.device_put(img_ids, dev),
                    jax.device_put(txt_ids, dev),
                )
                if s == self.n_stages - 1:
                    return res
                carrier = res
            return res  # n_stages == 1: res is already the output

        # async dispatch: launch every microbatch's chain without blocking;
        # stage s of microbatch m runs while stage s-1 handles m+1
        outs = [run_mb(m) for m in range(n_mb)]
        return jnp.concatenate([jax.device_put(o, self.devices[-1]) for o in outs])

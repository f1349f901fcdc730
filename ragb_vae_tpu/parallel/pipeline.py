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

from collections import OrderedDict
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
    lora_rank: int = 0
    lora_alpha: float = 0.0

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
                lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
                name=f"transformer_blocks_{i}",
            )(img, txt, temb, rope)

        if self.single_blocks:
            x = jnp.concatenate([txt, img], axis=1)
            for i in self.single_blocks:
                x = FluxSingleTransformerBlock(
                    cfg, dtype=self.dtype, weight_quant=self.weight_quant,
                    lora_rank=self.lora_rank, lora_alpha=self.lora_alpha,
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
        lora_rank: int = 0,
        lora_alpha: float = 0.0,
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
                lora_rank=lora_rank,
                lora_alpha=lora_alpha,
            )
            for s, (dr, sr) in enumerate(ranges)
        ]
        # loop-invariant small tensors (pooled/ids/guidance) are re-sent to
        # every stage on every microbatch of every denoising step otherwise;
        # the cache holds a ref so id() stays valid for its lifetime.
        # Bounded LRU: each serving request creates FRESH pooled/ids arrays,
        # so an unbounded id()-keyed cache grows (host ref + one device copy
        # per stage) per request for the daemon's lifetime. A sampling call
        # touches ~4 distinct constants; 64 entries is generous headroom.
        self._const_cache: "OrderedDict" = OrderedDict()
        self._const_cache_cap = 64
        self._fns = [
            jax.jit((lambda stage: lambda p, *a: stage.apply({"params": p}, *a))(stage))
            for stage in self.stages
        ]

    def _put_cached(self, arr: Array, dev: Any) -> Array:
        entry = self._const_cache.get(id(arr))
        if entry is None or entry[0] is not arr:
            entry = (arr, {})
            self._const_cache[id(arr)] = entry
        else:
            self._const_cache.move_to_end(id(arr))
        placed = entry[1].get(dev)
        if placed is None:
            placed = jax.device_put(arr, dev)
            entry[1][dev] = placed
        while len(self._const_cache) > self._const_cache_cap:
            self._const_cache.popitem(last=False)
        return placed

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
                    self._put_cached(pooled, dev),
                    jax.device_put(ts, dev),  # varies per step — not cached
                    None if g is None else self._put_cached(g, dev),
                    self._put_cached(img_ids, dev),
                    self._put_cached(txt_ids, dev),
                )
                if s == self.n_stages - 1:
                    return res
                carrier = res
            return res  # n_stages == 1: res is already the output

        # async dispatch: launch every microbatch's chain without blocking;
        # stage s of microbatch m runs while stage s-1 handles m+1
        outs = [run_mb(m) for m in range(n_mb)]
        return jnp.concatenate([jax.device_put(o, self.devices[-1]) for o in outs])


def pipelined_sample_latents(
    model: Any,
    pipe: PipelinedFluxTransformer,
    stage_params: List[PyTree],
    cond_latent: Array,
    init_noise: Array,
    step_noises: Any,
    *,
    microbatch: int = 1,
) -> Array:
    """Noise-injected core of `pipelined_sample` — the pipelined
    counterpart of `sample_latents_from_noise` (same contract: ALL noise
    is an argument, so per-request determinism holds for serving)."""
    from ragb_vae_tpu.ops.packing import (
        pack_latents,
        prepare_latent_image_ids,
        unpack_latents,
    )

    latents = init_noise.astype(jnp.float32)
    num_inference_steps = len(step_noises)

    sched = model.sampling_schedule(num_inference_steps)
    sigmas = np.asarray(sched.sigmas)
    timesteps = np.asarray(sched.timesteps)

    bsz = cond_latent.shape[0]
    latent_h, latent_w = cond_latent.shape[1], cond_latent.shape[2]
    ids_single = prepare_latent_image_ids(latent_h // 2, latent_w // 2)
    img_ids = jnp.concatenate([ids_single, ids_single], axis=0)
    packed_cond = pack_latents(cond_latent.astype(model.dtype))
    seq_cond = packed_cond.shape[1]

    prompt = jnp.broadcast_to(
        model.prompt_embeds, (bsz,) + model.prompt_embeds.shape[1:]
    ).astype(model.dtype)
    pooled = jnp.broadcast_to(
        model.pooled_prompt_embeds, (bsz,) + model.pooled_prompt_embeds.shape[1:]
    ).astype(model.dtype)
    guidance = model._guidance(bsz)

    for i in range(num_inference_steps):
        sigma = float(sigmas[i])
        noisy = (1.0 - sigma) * latents + sigma * step_noises[i].astype(jnp.float32)
        packed = jnp.concatenate(
            [packed_cond, pack_latents(noisy.astype(model.dtype))], axis=1
        )
        timestep = jnp.broadcast_to(timesteps[i] / 1000.0, (bsz,))
        pred = pipe(
            stage_params,
            hidden_states=packed,
            encoder_hidden_states=prompt,
            pooled_projections=pooled,
            timestep=timestep,
            img_ids=img_ids,
            txt_ids=model.text_ids,
            guidance=guidance,
            microbatch=microbatch,
        )
        pred_target = unpack_latents(
            pred[:, seq_cond:, :].astype(jnp.float32), latent_h, latent_w
        )
        latents = sched.step(pred_target, i, latents)
    return latents


def pipelined_sample(
    model: Any,
    pipe: PipelinedFluxTransformer,
    stage_params: List[PyTree],
    vae_params: PyTree,
    gt: Array,
    *,
    num_inference_steps: int = 20,
    key: jax.Array,
    microbatch: int = 1,
) -> Array:
    """`FluxTextAlphaModel.sample` with the transformer pipelined.

    The denoising loop runs on the host (a cross-stage pipeline cannot
    live inside one jitted scan); everything else — noise derivation from
    `key`, the per-step re-noising quirk, the FlowMatchEuler step, the
    packing/slicing — mirrors `sample_latents_from_noise`
    (models/flux_kontext_textalpha.py) exactly, and
    tests/test_pipeline_parallel.py pins equality with the monolithic
    `model.sample` for identical keys.
    """
    k_enc, k_init, k_loop = jax.random.split(key, 3)
    cond_latent = model.encode_latents(vae_params, gt, k_enc)
    init_noise = jax.random.normal(k_init, cond_latent.shape, dtype=jnp.float32)
    step_noises = [
        jax.random.normal(
            jax.random.fold_in(k_loop, i), cond_latent.shape, dtype=jnp.float32
        )
        for i in range(num_inference_steps)
    ]
    latents = pipelined_sample_latents(
        model, pipe, stage_params, cond_latent, init_noise, step_noises,
        microbatch=microbatch,
    )
    decoded = model.vae.decode(
        vae_params,
        (latents / model.scaling_factor + model.shift_factor).astype(model.dtype),
    )
    return jnp.clip((decoded.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Pipeline-parallel TRAINING (GPipe microbatch backward, VERDICT r3 item 6)
# ---------------------------------------------------------------------------
#
# The forward pipeline above covers serving; this section adds the LoRA
# training step: microbatches stream forward through the stages (storing
# only each stage's INPUT carrier), then backward in reverse stage order
# with the stage forward recomputed inside each backward program (GPipe
# with full rematerialization — the standard TPU memory/compute trade).
# Per boundary the backward moves one carrier cotangent, device-to-device,
# exactly mirroring the forward's activation hop; there are still no
# collectives. The frozen base never takes gradients (LoRA fine-tune,
# reference trains adapters only: src/training/flux_kontext_textalpha_lora.py),
# so each stage's backward differentiates w.r.t. its lora leaves + carrier.
#
# Loss semantics mirror FluxTextAlphaModel.compute_loss_from_latents
# bit-for-bit: the global loss is sum_mb(weighted per-sample sums) /
# sum(weights); each microbatch contributes the NUMERATOR (and its grads),
# and the single division by the global weight sum happens at the end —
# so microbatch composition cannot perturb the weighted mean.


def _stage_train_fns(pipe: "PipelinedFluxTransformer"):
    """Per-stage (fwd, bwd) jitted programs for GPipe training.

    fwd(base, lora, *carrier, *consts) -> carrier_out (or pred for the last
    stage); bwd(...) additionally takes the output cotangent and returns
    (lora_grads, carrier_cotangent), recomputing the forward inside the
    program (rematerialization) so the forward pass never stores residuals.
    """
    from ragb_vae_tpu.models.flux_weights import merge_params

    fns = []
    for stage in pipe.stages:

        def make(stage):
            def apply(base, lora, img, txt, temb, pooled, ts, g, img_ids, txt_ids):
                return stage.apply(
                    {"params": merge_params(base, lora)},
                    img, txt, temb, pooled, ts, g, img_ids, txt_ids,
                )

            def bwd(base, lora, img, txt, temb, pooled, ts, g, img_ids,
                    txt_ids, cot):
                def f(lora, img, txt, temb):
                    return apply(base, lora, img, txt, temb, pooled, ts, g,
                                 img_ids, txt_ids)

                _, vjp = jax.vjp(f, lora, img, txt, temb)
                g_lora, g_img, g_txt, g_temb = vjp(cot)
                return g_lora, (g_img, g_txt, g_temb)

            return jax.jit(apply), jax.jit(bwd)

        fns.append(make(stage))
    return fns


def _loss_cot_fn(seq_cond: int, latent_h: int, latent_w: int):
    """Jitted (numerator, d numerator / d pred) for one microbatch.

    numerator = sum_i w_i * mean(weighting_i * (pred_target_i - target_i)^2);
    the caller divides by the GLOBAL weight sum once, after accumulation.
    """
    from ragb_vae_tpu.ops.packing import unpack_latents

    @jax.jit
    def f(pred, loss_target, weighting, w):
        def num(pred):
            pred_target = unpack_latents(
                pred[:, seq_cond:, :].astype(jnp.float32), latent_h, latent_w
            )
            per_sample = jnp.mean(
                (weighting * (pred_target - loss_target) ** 2).reshape(
                    pred.shape[0], -1
                ),
                axis=1,
            )
            return jnp.sum(per_sample * w)

        return jax.value_and_grad(num)(pred)

    return f


def pipelined_lora_loss_and_grads(
    pipe: "PipelinedFluxTransformer",
    stage_base: List[PyTree],
    stage_lora: List[PyTree],
    *,
    hidden_states: Array,
    encoder_hidden_states: Array,
    pooled_projections: Array,
    timestep: Array,
    img_ids: Array,
    txt_ids: Array,
    guidance: Optional[Array],
    loss_target: Array,   # (B, h, w, C) = noise - target_latent
    weighting: Array,     # (B, 1, 1, 1) SD3 sigma weighting
    weights: Array,       # (B,) sample weights (padding -> 0)
    seq_cond: int,
    latent_h: int,
    latent_w: int,
    microbatch: int = 1,
    _fns=None,
):
    """GPipe fwd+bwd over the stages; returns (loss, per-stage lora grads).

    Grads are the gradient of the SAME weighted-batch-mean loss
    `compute_loss_from_latents` defines, living on each stage's device.
    """
    b = hidden_states.shape[0]
    if b % microbatch:
        raise ValueError(f"batch {b} not divisible by microbatch {microbatch}.")
    n_mb = b // microbatch
    n_stages = pipe.n_stages
    fns = _fns if _fns is not None else _stage_train_fns(pipe)
    loss_fn = _loss_cot_fn(seq_cond, latent_h, latent_w)
    devs = pipe.devices

    def consts_for(s: int, sl: slice):
        dev = devs[s]
        g = guidance[sl] if guidance is not None else None
        return (
            pipe._put_cached(pooled_projections[sl], dev)
            if n_mb == 1 else jax.device_put(pooled_projections[sl], dev),
            jax.device_put(timestep[sl], dev),
            None if g is None else jax.device_put(g, dev),
            pipe._put_cached(img_ids, dev),
            pipe._put_cached(txt_ids, dev),
        )

    # ---- forward: store each stage's INPUT carrier per microbatch ----
    carriers = [[None] * n_stages for _ in range(n_mb)]  # [mb][stage]
    preds = [None] * n_mb
    for m in range(n_mb):
        sl = slice(m * microbatch, (m + 1) * microbatch)
        temb0 = jnp.zeros((microbatch, pipe.config.inner_dim), pipe.dtype)
        carrier = (hidden_states[sl], encoder_hidden_states[sl], temb0)
        for s in range(n_stages):
            carrier = jax.device_put(carrier, devs[s])
            carriers[m][s] = carrier
            out = fns[s][0](stage_base[s], stage_lora[s], *carrier,
                            *consts_for(s, sl))
            carrier = out
        preds[m] = out

    # ---- loss numerator + pred cotangent per microbatch (last device) ----
    nums, cots = [], []
    last = devs[-1]
    for m in range(n_mb):
        sl = slice(m * microbatch, (m + 1) * microbatch)
        num, cot = loss_fn(
            preds[m],
            jax.device_put(loss_target[sl], last),
            jax.device_put(weighting[sl], last),
            jax.device_put(weights[sl], last),
        )
        nums.append(num)
        cots.append(cot)

    # ---- backward: reverse stage order, accumulate lora grads in place ----
    grads: List[PyTree] = [None] * n_stages
    for m in range(n_mb):
        sl = slice(m * microbatch, (m + 1) * microbatch)
        cot = cots[m]
        for s in range(n_stages - 1, -1, -1):
            cot = jax.device_put(cot, devs[s])
            g_lora, cot = fns[s][1](
                stage_base[s], stage_lora[s], *carriers[m][s],
                *consts_for(s, sl), cot,
            )
            grads[s] = g_lora if grads[s] is None else jax.tree_util.tree_map(
                jnp.add, grads[s], g_lora
            )

    # ---- the single global division of the weighted mean ----
    den = jnp.maximum(jnp.sum(weights.astype(jnp.float32)), 1e-8)
    loss = sum(jax.device_put(n, devs[-1]) for n in nums) / jax.device_put(den, devs[-1])
    grads = [
        jax.tree_util.tree_map(
            lambda g: g / jax.device_put(den, devs[s]), grads[s]
        )
        for s in range(n_stages)
    ]
    return loss, grads


class PipelineLoraTrainer:
    """LoRA training with the frozen FLUX base pipeline-sharded.

    The missing training half of `PipelinedFluxTransformer`: stages hold
    the (frozen) base shards, the per-stage LoRA adapters + their AdamW
    state live on the same devices, and each step runs the GPipe
    microbatched forward/backward above. Numerics match the monolithic
    `compute_loss_from_latents` + optax step exactly
    (tests/test_pp_training.py).

        trainer = PipelineLoraTrainer(model, pipe, optax.adamw(1e-4))
        stage_base, stage_lora = trainer.place_params(transformer_params)
        opt = trainer.init(stage_lora)
        (stage_lora, opt, loss, stats) = trainer.step(
            stage_base, stage_lora, opt, cond_latent, target_latent,
            noise, u, key=None, weights=w, microbatch=2)
    """

    def __init__(self, model: Any, pipe: "PipelinedFluxTransformer", tx: Any):
        import optax

        self.model = model
        self.pipe = pipe
        self.tx = tx
        self._fns = _stage_train_fns(pipe)
        self._upd = jax.jit(
            lambda g, o, p: self.tx.update(g, o, p), donate_argnums=(1,)
        )
        self._apply = jax.jit(optax.apply_updates)

    def place_params(self, params: PyTree) -> Tuple[List[PyTree], List[PyTree]]:
        """Full transformer tree -> per-device (base, lora) stage shards."""
        from ragb_vae_tpu.models.flux_weights import split_lora_params

        subtrees = split_transformer_params(params, self.pipe.config, self.pipe.n_stages)
        base, lora = [], []
        for sub, dev in zip(subtrees, self.pipe.devices):
            b, l = split_lora_params(sub)
            base.append(jax.device_put(b, dev))
            lora.append(jax.device_put(l, dev))
        return base, lora

    def init(self, stage_lora: List[PyTree]) -> List[PyTree]:
        return [
            jax.device_put(self.tx.init(l), d)
            for l, d in zip(stage_lora, self.pipe.devices)
        ]

    def step(
        self,
        stage_base: List[PyTree],
        stage_lora: List[PyTree],
        opt_states: List[PyTree],
        cond_latent: Array,
        target_latent: Array,
        noise: Array,
        u: Array,
        *,
        weights: Optional[Array] = None,
        microbatch: int = 1,
    ):
        """One GPipe LoRA train step from pre-encoded latents.

        Mirrors `compute_loss_from_latents` preprocessing exactly
        (models/flux_kontext_textalpha.py:452-501), then the pipelined
        fwd/bwd, then a per-stage AdamW update on each stage's device.
        """
        from ragb_vae_tpu.models.scheduler import compute_loss_weighting_for_sd3
        from ragb_vae_tpu.ops.packing import pack_latents, prepare_latent_image_ids

        model = self.model
        bsz = target_latent.shape[0]
        sched = model._train_sched
        n_train = model.scheduler.config.num_train_timesteps
        max_idx = min(len(sched.timesteps) - 1, len(sched.sigmas) - 1)
        indices = jnp.clip((u * n_train).astype(jnp.int32), 0, max_idx)
        timesteps = jnp.asarray(sched.timesteps)[indices]
        sigmas = jnp.asarray(sched.sigmas)[indices].reshape(bsz, 1, 1, 1)

        noisy_target = (1.0 - sigmas) * target_latent + sigmas * noise
        packed_cond = pack_latents(cond_latent.astype(model.dtype))
        packed_tgt = pack_latents(noisy_target.astype(model.dtype))
        packed = jnp.concatenate([packed_cond, packed_tgt], axis=1)

        latent_h, latent_w = target_latent.shape[1], target_latent.shape[2]
        ids_single = prepare_latent_image_ids(latent_h // 2, latent_w // 2)
        img_ids = jnp.concatenate([ids_single, ids_single], axis=0)

        prompt = jnp.broadcast_to(
            model.prompt_embeds, (bsz,) + model.prompt_embeds.shape[1:]
        ).astype(model.dtype)
        pooled = jnp.broadcast_to(
            model.pooled_prompt_embeds, (bsz,) + model.pooled_prompt_embeds.shape[1:]
        ).astype(model.dtype)

        w = (
            jnp.ones((bsz,), jnp.float32)
            if weights is None
            else weights.astype(jnp.float32)
        )
        weighting = compute_loss_weighting_for_sd3(
            sigmas, weighting_scheme="logit_normal"
        )
        loss, grads = pipelined_lora_loss_and_grads(
            self.pipe, stage_base, stage_lora,
            hidden_states=packed,
            encoder_hidden_states=prompt,
            pooled_projections=pooled,
            timestep=timesteps / 1000.0,
            img_ids=img_ids,
            txt_ids=model.text_ids,
            guidance=model._guidance(bsz),
            loss_target=noise - target_latent,
            weighting=weighting,
            weights=w,
            seq_cond=packed_cond.shape[1],
            latent_h=latent_h,
            latent_w=latent_w,
            microbatch=microbatch,
            _fns=self._fns,
        )
        new_lora, new_opt = [], []
        for s in range(self.pipe.n_stages):
            updates, o = self._upd(grads[s], opt_states[s], stage_lora[s])
            new_lora.append(self._apply(stage_lora[s], updates))
            new_opt.append(o)
        stats = {
            "timesteps_mean": jnp.mean(timesteps),
            "sigmas_mean": jnp.mean(sigmas),
        }
        return new_lora, new_opt, loss, stats

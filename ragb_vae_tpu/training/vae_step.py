"""Jitted RGBA-VAE train/eval steps (the hot loop, compiled once per bucket).

The reference's per-step Python (rgba_vae_stage.py:423-523) — triplet
build, encode, posterior split, sample, decode, loss assembly, backward,
clip, AdamW — becomes ONE compiled XLA program here: batch sharded over
the data mesh axis, params replicated, optimizer state ZeRO-sharded, and
gradient accumulation as an in-step scan. XLA inserts the cross-chip
reduce for gradients/metrics (replacing NCCL all-reduce / DeepSpeed
reduce-scatter) and fuses the elementwise loss algebra into the conv
epilogues.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ragb_vae_tpu.models.losses import AlphaVaeLossConfig
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.ops.gaussian import split_batch
from ragb_vae_tpu.ops.metrics import alpha_mae, psnr
from ragb_vae_tpu.ops.rgba import (
    composite_over_background,
    ensure_alpha,
    to_vae_range,
)
from ragb_vae_tpu.ops.triplet import detail_augmented_triplet
from ragb_vae_tpu.parallel import (
    accumulated_grads,
    batch_sharding,
    replicated,
    zero_sharding,
)

Array = jnp.ndarray
PyTree = Any


@dataclasses.dataclass(frozen=True)
class VaeStepConfig:
    """Static knobs of the compiled step (mirrors flux_vae.yaml training.*)."""

    kl_scale: float = 0.0
    ref_kl_scale: float = 0.0
    lpips_scale: float = 0.0
    gradient_accumulation_steps: int = 1
    compute_dtype: Any = jnp.float32


def make_optimizer(
    learning_rate: float,
    *,
    betas: Tuple[float, float] = (0.5, 0.9),
    weight_decay: float = 0.01,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW chain matching torch.optim.AdamW(lr, betas=(0.5,0.9), fused=True)
    + accelerator.clip_grad_norm_ (reference rgba_vae_stage.py:327,520-521).

    torch's AdamW defaults: eps 1e-8, weight_decay 0.01 — reproduced here.
    XLA fuses the update; no hand-written fused kernel needed.
    """
    parts = []
    if max_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    parts.append(
        optax.adamw(
            learning_rate,
            b1=betas[0],
            b2=betas[1],
            eps=1e-8,
            weight_decay=weight_decay,
        )
    )
    return optax.chain(*parts)


def vae_loss_fn(
    params: PyTree,
    batch: Dict[str, Array],
    key: jax.Array,
    *,
    model: RgbaVAE,
    loss_cfg: AlphaVaeLossConfig,
    step_cfg: VaeStepConfig,
    ref_params: Optional[PyTree] = None,
    lpips_fn: Optional[Callable[[Array, Array], Array]] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Loss assembly with reference semantics (rgba_vae_stage.py:448-516).

    `batch["images"]`: (B, H, W, 4) RGBA in [0, 1].
    `batch["weights"]` (optional): (B,) per-sample loss weights — zeros mark
    padding samples added for mesh divisibility, making the loss exactly
    invariant to padding (the reference never pads; NCCL DP tolerates
    ragged per-rank batches).
    """
    compute_dtype = step_cfg.compute_dtype
    target = jnp.clip(batch["images"], 0.0, 1.0)
    weights = batch.get("weights")
    target_vae = to_vae_range(target).astype(compute_dtype)
    triplet = detail_augmented_triplet(target_vae)

    posterior_all = model.encode(params, triplet)
    posterior, posterior_black, posterior_white = split_batch(posterior_all, 3)
    z = posterior.sample(key, dtype=compute_dtype)
    pred = model.decode(params, z)

    recon_loss = loss_cfg.reconstruction_loss(pred, target_vae, weights)
    total = recon_loss
    metrics: Dict[str, Array] = {"train/recon": recon_loss}

    if step_cfg.lpips_scale > 0.0 and lpips_fn is not None:
        lpips_loss = lpips_fn(pred, target_vae, weights)
        total = total + step_cfg.lpips_scale * lpips_loss
        metrics["train/lpips"] = lpips_loss

    if step_cfg.kl_scale > 0.0:
        kl = loss_cfg.kl_loss(posterior, weights=weights)
        total = total + step_cfg.kl_scale * kl
        metrics["train/kl"] = kl

    if step_cfg.ref_kl_scale > 0.0 and ref_params is not None:
        ref_posterior_all = jax.tree_util.tree_map(
            jax.lax.stop_gradient, model.encode(ref_params, triplet)
        )
        _, ref_black, ref_white = split_batch(ref_posterior_all, 3)
        ref_kl = 0.5 * (
            loss_cfg.kl_loss(posterior_black, ref_black, weights=weights)
            + loss_cfg.kl_loss(posterior_white, ref_white, weights=weights)
        )
        total = total + step_cfg.ref_kl_scale * ref_kl
        metrics["train/ref_kl"] = ref_kl

    metrics["train/loss"] = total
    return total, metrics


def memory_kind_shardings(shardings: PyTree, example: PyTree, kind: str) -> PyTree:
    """NamedSharding pytree with `memory_kind=kind` on non-scalar leaves.

    Scalar leaves (optax step counts) stay in device memory — transferring
    a 4-byte counter buys nothing and some backends reject host scalars in
    compiled programs.
    """
    from jax.sharding import NamedSharding

    def f(s, ex):
        if getattr(ex, "ndim", 0) >= 1:
            return NamedSharding(s.mesh, s.spec, memory_kind=kind)
        return s

    return jax.tree_util.tree_map(f, shardings, example)


def host_offload_shardings(shardings: PyTree, example: PyTree) -> PyTree:
    """`memory_kind="pinned_host"` variant of a NamedSharding pytree."""
    return memory_kind_shardings(shardings, example, "pinned_host")


def make_train_step(
    model: RgbaVAE,
    tx: optax.GradientTransformation,
    loss_cfg: AlphaVaeLossConfig,
    step_cfg: VaeStepConfig,
    *,
    mesh: Optional[Mesh] = None,
    ref_params: Optional[PyTree] = None,
    lpips_fn: Optional[Callable[[Array, Array], Array]] = None,
    opt_state_example: Optional[PyTree] = None,
    donate: bool = True,
    offload_opt_state: bool = False,
):
    """Build the compiled train step.

    Returns `step(params, opt_state, batch, key) -> (params, opt_state, metrics)`.
    With a mesh: batch comes in sharded on the data axis, params/metrics are
    replicated, and opt_state keeps a ZeRO-style layout across steps.

    `offload_opt_state=True` parks the AdamW moments in host memory between
    steps (the ZeRO-Offload move — the reference's DeepSpeed config exposes
    it as `offload_optimizer.device` in configs/deepspeed_zero2.json:5-7,
    set to "none" there): persistent HBM drops by 2x the param bytes, the
    update pays a host round-trip per step. On TPU the jit binds the host
    buffers directly (XLA schedules the DMAs inside the step); elsewhere
    the executable cannot address host memory, so transfers happen at the
    python boundary — same numerics, same layout, CI-testable.
    """
    loss = partial(
        vae_loss_fn,
        model=model,
        loss_cfg=loss_cfg,
        step_cfg=step_cfg,
        ref_params=ref_params,
        lpips_fn=lpips_fn,
    )

    def step(params, opt_state, batch, key):
        total, metrics, grads = accumulated_grads(
            lambda p, b, k: loss(p, b, k),
            params,
            batch,
            key,
            step_cfg.gradient_accumulation_steps,
            # weight each microbatch by its real-sample weight sum so
            # padding stays exactly invariant across the accumulation split
            micro_weight_fn=(
                (lambda mb: jnp.sum(mb["weights"])) if "weights" in batch else None
            ),
        )
        metrics["train/grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if mesh is None:
        if offload_opt_state:
            raise ValueError("offload_opt_state requires a mesh")
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    opt_shardings = (
        zero_sharding(opt_state_example, mesh) if opt_state_example is not None else rep
    )
    if not offload_opt_state:
        return jax.jit(
            step,
            in_shardings=(rep, opt_shardings, bsh, rep),
            out_shardings=(rep, opt_shardings, rep),
            donate_argnums=(0, 1) if donate else (),
        )

    if opt_state_example is None:
        raise ValueError("offload_opt_state requires opt_state_example")
    host_shardings = host_offload_shardings(opt_shardings, opt_state_example)
    if jax.default_backend() == "tpu":
        # The compiled program cannot compute on pinned_host operands
        # (mixing memory spaces in an op is a compile error — found live
        # on the tunneled v5e, benchmarks/logs/r4/offload_512.log): the
        # moments must be DMA'd into device memory inside the step and
        # parked back out before it returns. device_put inside jit lowers
        # to exactly those transfers, which XLA schedules around the
        # update compute.
        dev_shardings = memory_kind_shardings(
            opt_shardings, opt_state_example, "device"
        )

        def tpu_offloaded_step(params, opt_state, batch, key):
            opt_state = jax.device_put(opt_state, dev_shardings)
            params, opt_state, metrics = step(params, opt_state, batch, key)
            return params, jax.device_put(opt_state, host_shardings), metrics

        return jax.jit(
            tpu_offloaded_step,
            in_shardings=(rep, host_shardings, bsh, rep),
            out_shardings=(rep, host_shardings, rep),
            donate_argnums=(0, 1) if donate else (),
        )
    # Portable fallback (CPU mesh in tests): compiled programs cannot bind
    # pinned_host buffers off-TPU (annotate_device_placement unimplemented),
    # so the H2D/D2H hop happens at the python boundary instead of inside
    # the executable. Bit-identical math either way.
    inner = jax.jit(
        step,
        in_shardings=(rep, opt_shardings, bsh, rep),
        out_shardings=(rep, opt_shardings, rep),
        donate_argnums=(0, 1) if donate else (),
    )

    def offloaded_step(params, opt_state, batch, key):
        opt_dev = jax.device_put(opt_state, opt_shardings)
        params, opt_dev, metrics = inner(params, opt_dev, batch, key)
        return params, jax.device_put(opt_dev, host_shardings), metrics

    return offloaded_step


def make_eval_step(
    model: RgbaVAE,
    *,
    mesh: Optional[Mesh] = None,
    background_specs: Sequence = ("white", "black"),
):
    """Validation metrics step (reference evaluate_rgba_vae body,
    rgba_vae_stage.py:730-753): sampled forward, PSNR over the configured
    background composites (val_background_colors), alpha MAE. Returns
    per-sample vectors so the caller can aggregate across batches/chips.
    """
    from ragb_vae_tpu.training.rgba_vae_stage import resolve_background_spec

    backgrounds = [(str(s), resolve_background_spec(s)) for s in background_specs]

    def step(params, images, key):
        images = ensure_alpha(jnp.clip(images, 0.0, 1.0))
        recon, _ = model.forward(params, images, key)
        out = {}
        for name, bg in backgrounds:
            gt_bg = composite_over_background(images, bg)
            recon_bg = composite_over_background(recon, bg)
            out[f"psnr_{name}"] = psnr(recon_bg, gt_bg)
        out["alpha_mae"] = alpha_mae(recon, images)
        out["recon"] = recon
        return out

    if mesh is None:
        return jax.jit(step)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    out_shardings = {f"psnr_{name}": bsh for name, _ in backgrounds}
    out_shardings.update({"alpha_mae": bsh, "recon": bsh})
    return jax.jit(
        step,
        in_shardings=(rep, bsh, rep),
        out_shardings=out_shardings,
    )


def init_train_state(
    model: RgbaVAE,
    params: PyTree,
    tx: optax.GradientTransformation,
    *,
    mesh: Optional[Mesh] = None,
    offload: bool = False,
) -> PyTree:
    """Initialize (and on a mesh, ZeRO-shard) the optimizer state.

    `offload=True` parks the state in pinned host memory (see
    make_train_step(offload_opt_state=...)); resume keeps the layout
    because the stage re-puts loaded state onto the live shardings.
    """
    if mesh is None:
        if offload:
            raise ValueError("offload requires a mesh")
        return tx.init(params)
    shapes = jax.eval_shape(tx.init, params)
    shardings = zero_sharding(shapes, mesh)
    state = jax.jit(tx.init, out_shardings=shardings)(params)
    if offload:
        state = jax.device_put(state, host_offload_shardings(shardings, shapes))
    return state

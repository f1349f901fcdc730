#!/usr/bin/env python
"""E2E LoRA training-step throughput on one chip.

Two jobs:

- default (mid-size, bf16): fused flash-attention backward vs the round-1
  recompute VJP. The per-op win (benchmarks/flash_bwd_bench.py) has to
  survive the full step — frozen bf16 base, LoRA fp32 params,
  flow-matching loss from fixed latents (no VAE), AdamW — to count.

- `--blocks full --quant int8`: the PRODUCTION stage-2 operating point
  (reference configs/flux_kontext_textalpha_lora.yaml:11-40 — rank-128
  LoRA on FLUX.1) as it actually fits one 16 GB v5e: frozen weight-only
  int8 base (~11.1 GiB) + fp32 LoRA adapters + AdamW, QLoRA-style
  (training.weight_quant: int8). The int8 tree is built host-side from
  eval_shape (the bf16 intermediate can never materialize on-chip);
  gradients flow through the int8 epilogue matmul's exact VJP. Emits
  img/s + MFU vs the frozen-base analytic FLOP walk
  (ops/flops.py:lora_train_step_flops, VERDICT r4 items 1-2).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

try:  # full-scale compiles are ~10 min through the tunnel; cache them
    from ragb_vae_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache(min_compile_time_secs=1.0)
except Exception:
    pass

import ragb_vae_tpu.ops.pallas.flash_attention as pa
from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig
from ragb_vae_tpu.models.flux_weights import merge_params, split_lora_params
from ragb_vae_tpu.models.scheduler import FlowMatchEulerConfig, FlowMatchEulerScheduler

LATENT = 64  # 64x64x16 latents = 512^2 images; packed seq 1024/stream
TEXT_SEQ = 512
MID_BLOCKS = (4, 8)
FULL_BLOCKS = (19, 38)


def build(blocks, quant: str, lora_rank: int, lora_alpha: float):
    cfg = FluxTransformerConfig(
        in_channels=64,
        num_layers=blocks[0],
        num_single_layers=blocks[1],
        attention_head_dim=128,
        num_attention_heads=24,
        joint_attention_dim=4096,
        pooled_projection_dim=768,
        guidance_embeds=True,
    )
    from ragb_vae_tpu.models.rgba_vae import RgbaVAE
    from ragb_vae_tpu.models.vae_config import AutoencoderConfig

    vae_cfg = AutoencoderConfig.tiny()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    rng = np.random.default_rng(0)
    model = FluxTextAlphaModel(
        transformer_config=cfg,
        vae=RgbaVAE(config=vae_cfg),  # scale-factor holder; latents fed directly
        scheduler=FlowMatchEulerScheduler(FlowMatchEulerConfig()),
        prompt_embeds=jnp.asarray(
            rng.standard_normal((1, TEXT_SEQ, cfg.joint_attention_dim)) * 0.02,
            jnp.bfloat16,
        ),
        pooled_prompt_embeds=jnp.asarray(
            rng.standard_normal((1, cfg.pooled_projection_dim)) * 0.02, jnp.bfloat16
        ),
        text_ids=jnp.zeros((TEXT_SEQ, 3)),
        lora_rank=lora_rank,
        lora_alpha=lora_alpha,
        dtype=jnp.bfloat16,
        weight_quant=quant,
        remat=blocks == FULL_BLOCKS,  # full scale needs remat to fit 16 GB
    )
    dummy = dict(
        hidden_states=jnp.zeros((1, 8, cfg.in_channels), jnp.bfloat16),
        encoder_hidden_states=model.prompt_embeds[:, :8],
        pooled_projections=model.pooled_prompt_embeds,
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((8, 3)),
        txt_ids=jnp.zeros((8, 3)),
        guidance=jnp.asarray([3.5]),
    )
    plain = FluxTextAlphaModel  # noqa: F841  (readability)
    if quant == "int8":
        # host-side quantized tree from eval_shape of the PLAIN (bf16)
        # init — the 24 GB bf16 intermediate never exists anywhere
        from ragb_vae_tpu.models.flux_transformer import FluxTransformer2D
        from ragb_vae_tpu.models.quantize import random_quantized_params_like

        plain_mod = FluxTransformer2D(
            cfg, dtype=jnp.bfloat16, lora_rank=lora_rank, lora_alpha=lora_alpha
        )
        shapes = jax.eval_shape(
            lambda: plain_mod.init(jax.random.PRNGKey(0), **dummy)
        )["params"]
        params = random_quantized_params_like(shapes, seed=0)
    else:
        params = model.transformer.init(jax.random.PRNGKey(0), **dummy)["params"]
    base, lora = split_lora_params(params)
    if quant != "int8":
        base = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, base
        )
    n_base = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(base))
    n_lora = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(lora))
    print(
        f"base {n_base/1e9:.2f}B {'int8+scales' if quant == 'int8' else 'bf16'}, "
        f"lora {n_lora/1e6:.1f}M fp32 (rank {lora_rank})",
        flush=True,
    )
    return model, cfg, base, lora


def time_step(model, base, lora, batch: int, iters: int):
    """One measured config: jit the step, run, return (s/step, loss)."""
    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.standard_normal((batch, LATENT, LATENT, 16)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((batch, LATENT, LATENT, 16)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((batch, LATENT, LATENT, 16)), jnp.float32)
    u = jnp.asarray(rng.random(batch), jnp.float32)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(3e-5, b1=0.9, b2=0.95))
    opt0 = tx.init(lora)

    def loss_fn(lora_p, base_p):
        params = merge_params(base_p, lora_p)
        loss, _ = model.compute_loss_from_latents(params, cond, tgt, noise, u)
        return loss

    # base rides as an ARGUMENT — closing over it bakes the full tree into
    # the compile payload; donate lora/opt so the update is in-place
    @jax.jit
    def step_m(lora_p, opt, base_p):
        loss, grads = jax.value_and_grad(loss_fn)(lora_p, base_p)
        updates, opt2 = tx.update(grads, opt, lora_p)
        return optax.apply_updates(lora_p, updates), opt2, loss

    lp, op, loss = step_m(lora, opt0, base)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        lp, op, loss = step_m(lp, op, base)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / iters, float(loss)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", choices=["mid", "full"], default="mid")
    ap.add_argument("--quant", choices=["none", "int8"], default="none",
                    help="int8: frozen weight-only int8 base (QLoRA; the only "
                    "form of full-scale stage-2 that fits one 16 GB chip)")
    ap.add_argument("--batches", type=int, nargs="*", default=None,
                    help="default: [4] mid, [4, 2, 1] full (first that fits)")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--rank", type=int, default=128)
    ap.add_argument("--lora-alpha", type=float, default=192.0,
                    help="reference flux_kontext_textalpha_lora.yaml alpha")
    args = ap.parse_args()

    blocks = FULL_BLOCKS if args.blocks == "full" else MID_BLOCKS
    batches = args.batches or ([4, 2, 1] if blocks == FULL_BLOCKS else [4])
    iters = args.iters or (3 if blocks == FULL_BLOCKS else 6)
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    model, cfg, base, lora = build(blocks, args.quant, args.rank, args.lora_alpha)

    # numpy trees re-upload on every jit call (no transfer cache): put once
    t0 = time.perf_counter()
    base = jax.block_until_ready(jax.device_put(base))
    lora = jax.block_until_ready(jax.device_put(lora))
    t_put = time.perf_counter() - t0
    if t_put > 1.0:
        print(f"params -> device: {t_put:.1f} s (one-time)", flush=True)

    if args.blocks == "mid" and args.quant == "none" and args.batches is None:
        # historical A/B mode: fused flash backward vs recompute VJP
        for mode in ("auto", "recompute"):
            pa.BACKWARD = mode
            dt, loss = time_step(model, base, lora, 4, iters)
            print(
                f"bwd={mode}: {dt*1e3:8.1f} ms/step ({4/dt:.2f} img/s) "
                f"loss={loss:.4f}",
                flush=True,
            )
        pa.BACKWARD = "auto"
        return

    results = {}
    for batch in batches:
        try:
            dt, loss = time_step(model, base, lora, batch, iters)
        except Exception as exc:  # OOM at this batch — try smaller
            # Keep the head of the message: chip-HBM OOM, remote-compile
            # SIGKILL (tunnel-host OOM), and tunnel drops need different
            # responses (r5: all three batches "failed (JaxRuntimeError)"
            # with no way to tell which).
            msg = " ".join(str(exc).split())[:2000]
            print(f"b{batch}: failed ({type(exc).__name__}): {msg}", flush=True)
            # drop the failed batch's executable + any partial allocations
            # before trying a smaller batch: a b4 HBM OOM can otherwise
            # poison b2/b1 (dead executables pin donated buffers)
            import gc

            jax.clear_caches()
            gc.collect()
            continue
        print(
            f"lora step b{batch} ({blocks[0]}+{blocks[1]} blocks, "
            f"{args.quant}): {dt*1e3:.1f} ms/step -> {batch/dt:.3f} img/s "
            f"loss={loss:.4f}",
            flush=True,
        )
        results[batch] = batch / dt
        break  # first batch that fits is the operating point

    if not results:
        print("no batch completed; nothing to report")
        return
    best = max(results, key=results.get)
    payload = {
        "metric": f"lora_train_step_512px_"
        f"{'fullscale' if blocks == FULL_BLOCKS else 'midsize'}"
        f"{'_' + args.quant if args.quant != 'none' else ''}_b{best}",
        "value": round(results[best], 3),
        "unit": "img/s/chip",
        "vs_baseline": 0.0,
    }
    try:
        from ragb_vae_tpu.ops.flops import lora_train_step_flops, mfu

        img_seq = 2 * (LATENT // 2) ** 2  # packed cond+target streams
        util = mfu(
            results[best],
            lora_train_step_flops(cfg, img_seq, TEXT_SEQ),
            dev.device_kind,
        )
        if util is not None:
            payload["mfu"] = round(util, 4)
    except Exception as exc:
        print(f"mfu unavailable: {exc}", flush=True)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

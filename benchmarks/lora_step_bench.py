#!/usr/bin/env python
"""E2E LoRA training-step on a mid-size Flux (full 3072 width, fewer
blocks) on one chip: fused flash-attention backward vs the round-1
recompute VJP. The per-op win (benchmarks/flash_bwd_bench.py) has to
survive the full step — frozen bf16 base, LoRA fp32 params, flow-matching
loss from fixed latents (no VAE), AdamW — to count.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import ragb_vae_tpu.ops.pallas.flash_attention as pa
from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig
from ragb_vae_tpu.models.flux_weights import merge_params, split_lora_params
from ragb_vae_tpu.models.scheduler import FlowMatchEulerConfig, FlowMatchEulerScheduler

BATCH = 4
LATENT = 64  # 64x64x16 latents = 512^2 images; packed seq 1024/stream
TEXT_SEQ = 512
ITERS = 6


def build():
    cfg = FluxTransformerConfig(
        in_channels=64,
        num_layers=4,
        num_single_layers=8,
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
        lora_rank=128,
        lora_alpha=128.0,
        dtype=jnp.bfloat16,
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
    params = model.transformer.init(jax.random.PRNGKey(0), **dummy)["params"]
    base, lora = split_lora_params(params)
    base = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, base
    )
    n_base = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(base))
    n_lora = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(lora))
    print(f"base {n_base/1e9:.2f}B bf16, lora {n_lora/1e6:.1f}M fp32", flush=True)
    return model, base, lora


def main() -> None:
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    model, base, lora = build()
    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.standard_normal((BATCH, LATENT, LATENT, 16)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((BATCH, LATENT, LATENT, 16)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((BATCH, LATENT, LATENT, 16)), jnp.float32)
    u = jnp.asarray(rng.random(BATCH), jnp.float32)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4, b1=0.9, b2=0.95))
    opt0 = tx.init(lora)

    def loss_fn(lora_p, base_p):
        params = merge_params(base_p, lora_p)
        loss, _ = model.compute_loss_from_latents(params, cond, tgt, noise, u)
        return loss

    for mode in ("auto", "recompute"):
        pa.BACKWARD = mode

        # fresh jit per mode: the flag is read at trace time. base rides as
        # an ARGUMENT — closing over it bakes 5 GB of constants into the
        # compile payload.
        @jax.jit
        def step_m(lora_p, opt, base_p):
            loss, grads = jax.value_and_grad(loss_fn)(lora_p, base_p)
            updates, opt2 = tx.update(grads, opt, lora_p)
            return optax.apply_updates(lora_p, updates), opt2, loss

        lp, op, loss = step_m(lora, opt0, base)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            lp, op, loss = step_m(lp, op, base)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / ITERS
        print(
            f"bwd={mode}: {dt*1e3:8.1f} ms/step ({BATCH/dt:.2f} img/s) "
            f"loss={float(loss):.4f}",
            flush=True,
        )
    pa.BACKWARD = "auto"


if __name__ == "__main__":
    main()

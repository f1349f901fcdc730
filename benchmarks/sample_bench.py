#!/usr/bin/env python
"""20-step text-alpha sampler throughput — the inference product surface
(inference_rgba_flux.py -> FluxTextAlphaModel.sample).

Full FLUX.1 (19+38 blocks, 11.9 B params) exceeds a single 16 GB v5e in
bf16, so this measures the mid-size transformer (full 3072 width, 4 double
+ 8 single blocks — the same config the LoRA step bench uses) with the
REAL Flux VAE (full-size decoder, fused kernels + flash attention on),
512^2 RGBA in/out, and reports a full-scale estimate by scaling the
transformer share linearly in block count (19+38)/(4+8) — stated as an
estimate, the VAE share is measured.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

try:  # full-scale compiles are ~10 min through the tunnel; cache them
    from ragb_vae_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache(min_compile_time_secs=1.0)
except Exception:
    pass

from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.scheduler import FlowMatchEulerConfig, FlowMatchEulerScheduler
from ragb_vae_tpu.models.vae_config import AutoencoderConfig

SIZE = 512
STEPS = 20
TEXT_SEQ = 512
ITERS = 3
MID_BLOCKS = (4, 8)
FULL_BLOCKS = (19, 38)


def build(batch, blocks=MID_BLOCKS, quant="none"):
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
    vae_cfg = AutoencoderConfig.flux()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = SIZE
    rng = np.random.default_rng(0)
    vae = RgbaVAE(config=vae_cfg, dtype=jnp.bfloat16)
    vae.enable_fused()
    model = FluxTextAlphaModel(
        transformer_config=cfg,
        vae=vae,
        scheduler=FlowMatchEulerScheduler(FlowMatchEulerConfig()),
        prompt_embeds=jnp.asarray(
            rng.standard_normal((1, TEXT_SEQ, cfg.joint_attention_dim)) * 0.02,
            jnp.bfloat16,
        ),
        pooled_prompt_embeds=jnp.asarray(
            rng.standard_normal((1, cfg.pooled_projection_dim)) * 0.02, jnp.bfloat16
        ),
        text_ids=jnp.zeros((TEXT_SEQ, 3), jnp.float32),
        dtype=jnp.bfloat16,
        remat=True,
        weight_quant=quant,
    )
    latent = SIZE // model.vae_scale_factor
    dummy = dict(
        hidden_states=jnp.zeros((1, 8, cfg.in_channels), jnp.bfloat16),
        encoder_hidden_states=model.prompt_embeds,
        pooled_projections=model.pooled_prompt_embeds,
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((8, 3)),
        txt_ids=model.text_ids,
        guidance=jnp.asarray([3.5]),
    )
    if quant == "int8":
        # Full-scale path: the bf16 tree (~24 GB) can never materialize on a
        # 16 GB chip, so build the quantized tree host-side from eval_shape
        # of the PLAIN init (models/quantize.py).
        from ragb_vae_tpu.models.flux_transformer import FluxTransformer2D
        from ragb_vae_tpu.models.quantize import random_quantized_params_like

        plain = FluxTransformer2D(cfg, dtype=jnp.bfloat16)
        shapes = jax.eval_shape(
            lambda: plain.init(jax.random.PRNGKey(1), **dummy)
        )["params"]
        t_params = random_quantized_params_like(shapes, seed=1)
    else:
        t_params = model.transformer.init(jax.random.PRNGKey(1), **dummy)["params"]
        t_params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), t_params)
    vae_params = vae.init_params(jax.random.PRNGKey(2), image_size=64)
    vae_params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), vae_params)
    gt = jnp.asarray(
        np.random.default_rng(3).random((batch, SIZE, SIZE, 4)), jnp.float32
    )
    del latent
    return model, t_params, vae_params, gt


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, nargs="*", default=[1, 2, 4])
    parser.add_argument("--blocks", choices=["mid", "full"], default="mid",
                        help="full = real FLUX.1 scale (19+38 blocks, 11.9 B); "
                        "requires --quant int8 to fit one 16 GB chip")
    parser.add_argument("--quant", choices=["none", "int8"], default="none",
                        help="weight-only int8 transformer storage (QDense)")
    args = parser.parse_args()
    blocks = FULL_BLOCKS if args.blocks == "full" else MID_BLOCKS
    print(f"device: {jax.devices()[0]}")
    results = {}
    for batch in args.batches:
        model, t_params, vae_params, gt = build(batch, blocks=blocks, quant=args.quant)
        # The int8 tree is built HOST-side (numpy). jit does not cache
        # transfers of numpy arguments — without an explicit device_put the
        # timed loop re-ships the full 11.10 GiB tree through the tunnel on
        # EVERY call (measured: 818 s/batch instead of seconds). Put once,
        # time it, and hand the loop device-resident arrays.
        t0 = time.perf_counter()
        t_params = jax.block_until_ready(jax.device_put(t_params))
        t_put = time.perf_counter() - t0
        if t_put > 1.0:
            print(f"params -> device: {t_put:.1f} s (one-time)")

        @jax.jit
        def sample(t_params, vae_params, gt, key):
            return model.sample(
                t_params, vae_params, gt, num_inference_steps=STEPS, key=key
            )

        key = jax.random.PRNGKey(0)
        try:
            out = sample(t_params, vae_params, gt, key)
            float(jnp.sum(out.astype(jnp.float32)))  # compile + settle
            t0 = time.perf_counter()
            for i in range(ITERS):
                out = sample(t_params, vae_params, gt, jax.random.fold_in(key, i))
            float(jnp.sum(out.astype(jnp.float32)))
        except Exception as exc:  # 16 GB HBM: report the envelope honestly
            # (runtime OOM can also strike mid-loop after a clean warmup —
            # observed at b2: ResourceExhausted from the fused decode)
            print(f"sample {SIZE}px b{batch}: OOM/failed ({type(exc).__name__})")
            break
        dt = (time.perf_counter() - t0) / ITERS
        rate = batch / dt
        desc = f"{blocks[0]}+{blocks[1]} blocks" + (
            f", weight-only {args.quant}" if args.quant != "none" else ""
        )
        line = (
            f"sample {SIZE}px b{batch} {STEPS} steps ({desc}): "
            f"{dt:.3f} s/batch -> {rate:.3f} img/s"
        )
        if blocks == MID_BLOCKS:
            # full-scale estimate: transformer share scales with block count
            scale = (FULL_BLOCKS[0] + FULL_BLOCKS[1]) / (MID_BLOCKS[0] + MID_BLOCKS[1])
            est_full = batch / (dt * scale)  # upper bound: scales the WHOLE time
            line += f" | full-scale (19+38) conservative estimate >= {est_full:.3f} img/s"
        print(line)
        results[batch] = rate
    if not results:
        print("no batch completed; nothing to report")
        return
    best = max(results, key=results.get)
    payload = {
        "metric": f"textalpha_sample_{SIZE}px_{STEPS}step_"
        f"{'fullscale' if blocks == FULL_BLOCKS else 'midsize'}"
        f"{'_' + args.quant if args.quant != 'none' else ''}_b{best}",
        "value": round(results[best], 3),
        "unit": "img/s/chip",
        "vs_baseline": 0.0,
    }
    # MFU vs the analytic sampler walk (one cond encode + STEPS transformer
    # forwards over the doubled Kontext sequence + one decode; verified vs
    # XLA cost analysis in tests/test_flops.py). int8 runs the same bf16
    # MXU ops (the epilogue converts weights in the operand load), so the
    # bf16 peak is the right denominator.
    try:
        from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig as _C
        from ragb_vae_tpu.ops.flops import mfu, textalpha_sample_flops

        t_cfg = _C(
            in_channels=64, num_layers=blocks[0], num_single_layers=blocks[1],
            attention_head_dim=128, num_attention_heads=24,
            joint_attention_dim=4096, pooled_projection_dim=768,
            guidance_embeds=True,
        )
        vae_cfg = AutoencoderConfig.flux()
        vae_cfg.in_channels = 4
        vae_cfg.out_channels = 4
        util = mfu(
            results[best],
            textalpha_sample_flops(t_cfg, vae_cfg, SIZE, STEPS, TEXT_SEQ),
            jax.devices()[0].device_kind,
        )
        if util is not None:
            payload["mfu"] = round(util, 4)
            print(f"sampler MFU {util:.1%} of bf16 peak")
    except Exception as exc:
        print(f"mfu unavailable: {exc}")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

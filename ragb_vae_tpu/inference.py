"""Text-alpha inference (library + CLI core).

Parity with the reference inference_rgba_flux.py:46-116 — same flags,
LoRA rank/alpha auto-read from metadata.json, seeded sampling — driving
the jitted JAX sampling loop. `inference_rgba_flux.py` at the repo root
is a thin shim over this module; the installed `ragb-infer` entry point
calls it directly.
"""
from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Inference: predict text_alpha from RGBA input using FluxTextAlphaModel"
    )
    p.add_argument("--pretrained_model_name_or_path", type=str, required=True)
    p.add_argument("--rgba_vae_path", type=str, required=True)
    p.add_argument("--vae_subfolder", type=str, default="ae")
    p.add_argument("--lora_path", type=str, default=None,
                   help="Directory with saved LoRA weights (FluxPipeline.save_lora_weights format).")
    p.add_argument("--rank", type=int, default=96, help="LoRA rank (must match training).")
    p.add_argument("--lora_alpha", type=int, default=128, help="LoRA alpha (must match training).")
    p.add_argument("--input_image", type=str, required=True, help="Path to RGBA input image (condition).")
    p.add_argument("--output_path", type=str, required=True, help="Where to save predicted text_alpha RGBA.")
    p.add_argument("--steps", type=int, default=20, help="Number of flow steps during sampling.")
    p.add_argument("--seed", type=int, default=None, help="Optional seed for deterministic sampling.")
    p.add_argument("--precision", type=str, default="bf16", choices=["bf16", "fp16", "fp32"])
    return p.parse_args(argv)


def run(args: argparse.Namespace) -> None:
    import jax
    import jax.numpy as jnp

    from ragb_vae_tpu.data.image_io import load_rgba, save_rgba
    from ragb_vae_tpu.models.flux_kontext_textalpha import (
        FluxTextAlphaModel,
        read_lora_metadata,
    )

    dtype = {"bf16": jnp.bfloat16, "fp16": jnp.bfloat16, "fp32": jnp.float32}[args.precision]

    if args.lora_path:
        meta = read_lora_metadata(args.lora_path)
        if meta:
            if meta.get("rank") is not None:
                args.rank = int(meta["rank"])
            alpha = meta.get("lora_alpha", meta.get("alpha"))
            if alpha is not None:
                args.lora_alpha = int(alpha)
            print(f"Loaded LoRA metadata: rank={args.rank} alpha={args.lora_alpha}")

    model, t_params, vae_params = FluxTextAlphaModel.from_pretrained(
        args.pretrained_model_name_or_path,
        vae_path=args.rgba_vae_path,
        vae_subfolder=args.vae_subfolder,
        dtype=dtype,
        lora_rank=args.rank if args.lora_path else 0,
        lora_alpha=float(args.lora_alpha),
    )
    if args.lora_path:
        t_params = model.load_lora(t_params, args.lora_path)
    # single-chip fast path: fused whole-block kernels on TPU (faster than
    # per-sample slicing at every batch since the subpixel-upsample kernel,
    # benchmarks/results.md); sliced XLA elsewhere
    if jax.default_backend() == "tpu":
        model.vae.enable_fused()
    else:
        model.vae.enable_slicing()

    inp = load_rgba(args.input_image)[None]  # (1, H, W, 4) in [0, 1]
    key = jax.random.PRNGKey(args.seed if args.seed is not None else 0)
    pred = model.sample(
        t_params, vae_params, jnp.asarray(inp), num_inference_steps=args.steps, key=key
    )
    save_rgba(np.asarray(pred[0]), args.output_path)
    print(f"Saved to {args.output_path}")


def main(argv=None) -> None:
    run(parse_args(argv))

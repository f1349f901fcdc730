#!/usr/bin/env python
"""AOT memory analysis of the weight-only-int8 FLUX sampler.

The sampling loop is a lax.scan whose transformer params are
loop-invariant; QDense dequantizes int8 -> bf16 INSIDE the scan body. If
XLA's loop-invariant code motion hoisted those dequants, every bf16
kernel (~24 GB at full scale) would be live simultaneously and the whole
point of weight-only storage would be lost. This probe compiles the
sampler ahead-of-time from ShapeDtypeStructs (no weights materialize) and
reads compiled.memory_analysis(). The verdict is the DELTA between the
int8 program's temp bytes and the plain-bf16 program's (whose weights are
arguments, never temps): a delta ~= the bf16 weight size means every
dequant was hoisted; a delta near zero means dequants stay per-layer
inside the loop. (Absolute temp bytes are backend activations — on CPU
they are ~10 GiB for this sampler in BOTH modes.)

Run on CPU while the TPU tunnel is down (the pass pipeline differs, but a
gross hoist would show on both); re-run on TPU before trusting the
full-scale measurement.

  python benchmarks/quant_aot.py --blocks mid   # 4+8 blocks, fast
  python benchmarks/quant_aot.py --blocks full  # 19+38 blocks (11.9 B)
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
from ragb_vae_tpu.models.flux_transformer import (
    FluxTransformer2D,
    FluxTransformerConfig,
)
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.scheduler import FlowMatchEulerConfig, FlowMatchEulerScheduler
from ragb_vae_tpu.models.vae_config import AutoencoderConfig

SIZE = 512
STEPS = 20
TEXT_SEQ = 512
BLOCKS = {"tiny": (1, 2), "mid": (4, 8), "full": (19, 38)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--blocks", choices=["tiny", "mid", "full"], default="mid")
    p.add_argument("--steps", type=int, default=STEPS)
    args = p.parse_args()
    nl, ns = BLOCKS[args.blocks]

    cfg = FluxTransformerConfig(
        in_channels=64,
        num_layers=nl,
        num_single_layers=ns,
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
    vae = RgbaVAE(config=vae_cfg, dtype=jnp.bfloat16)

    def make_model(quant):
        return FluxTextAlphaModel(
            transformer_config=cfg,
            vae=vae,
            scheduler=FlowMatchEulerScheduler(FlowMatchEulerConfig()),
            prompt_embeds=jnp.zeros((1, TEXT_SEQ, cfg.joint_attention_dim), jnp.bfloat16),
            pooled_prompt_embeds=jnp.zeros((1, cfg.pooled_projection_dim), jnp.bfloat16),
            text_ids=jnp.zeros((TEXT_SEQ, 3), jnp.float32),
            dtype=jnp.bfloat16,
            remat=True,
            weight_quant=quant,
        )

    model = make_model("int8")

    dummy = dict(
        hidden_states=jnp.zeros((1, 8, cfg.in_channels), jnp.bfloat16),
        encoder_hidden_states=model.prompt_embeds,
        pooled_projections=model.pooled_prompt_embeds,
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((8, 3)),
        txt_ids=model.text_ids,
        guidance=jnp.asarray([3.5]),
    )
    plain = FluxTransformer2D(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: plain.init(jax.random.PRNGKey(1), **dummy))["params"]

    # abstract quantized tree: {kernel_q int8, kernel_scale f32} per Dense
    def q_abstract(node):
        if isinstance(node, dict) and "kernel" in node and node["kernel"].ndim == 2:
            out = {
                "kernel_q": jax.ShapeDtypeStruct(node["kernel"].shape, jnp.int8),
                "kernel_scale": jax.ShapeDtypeStruct(
                    (node["kernel"].shape[1],), jnp.float32
                ),
            }
            if "bias" in node:
                out["bias"] = jax.ShapeDtypeStruct(node["bias"].shape, jnp.float32)
            return out
        if isinstance(node, dict):
            return {k: q_abstract(v) for k, v in node.items()}
        return jax.ShapeDtypeStruct(node.shape, jnp.float32)

    t_abs = q_abstract(shapes)
    t_abs_plain = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, jnp.bfloat16), shapes
    )
    vae_abs = jax.eval_shape(
        lambda: jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16),
            vae.init_params(jax.random.PRNGKey(2), image_size=64),
        )
    )
    gt_abs = jax.ShapeDtypeStruct((1, SIZE, SIZE, 4), jnp.float32)
    key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)

    def compile_mode(m, t):
        def sample(t_params, vae_params, gt, key):
            return m.sample(
                t_params, vae_params, gt, num_inference_steps=args.steps, key=key
            )

        t0 = time.perf_counter()
        compiled = jax.jit(sample).lower(t, vae_abs, gt_abs, key_abs).compile()
        return compiled.memory_analysis(), time.perf_counter() - t0

    int8_arg_bytes = sum(
        np.prod(s.shape)
        * (1 if s.dtype == jnp.int8 else (4 if s.dtype == jnp.float32 else 2))
        for s in jax.tree_util.tree_leaves(t_abs)
    )
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    bf16_bytes = 2 * n_params
    print(f"transformer params: {n_params/1e9:.2f} B "
          f"(int8 tree {int8_arg_bytes/2**30:.2f} GiB, bf16 "
          f"{bf16_bytes/2**30:.2f} GiB)", flush=True)

    def report(name, m):
        total = m.argument_size_in_bytes + m.output_size_in_bytes + m.temp_size_in_bytes
        print(f"{name}: args {m.argument_size_in_bytes/2**30:6.2f} GiB | "
              f"temps {m.temp_size_in_bytes/2**30:6.2f} GiB | "
              f"total {total/2**30:6.2f} GiB", flush=True)

    # int8 first, and report it IMMEDIATELY: at full scale on a 16 GiB
    # target the plain-bf16 compile below can fail outright (22 GiB of
    # weight arguments cannot be allocated), and the int8 analysis — the
    # half that matters — must not be lost with it.
    mem, dt = compile_mode(model, t_abs)
    print(f"compiled int8 in {dt:.1f}s on {jax.default_backend()}", flush=True)
    report("int8 ", mem)

    try:
        mem_plain, dt_plain = compile_mode(make_model("none"), t_abs_plain)
    except Exception as exc:  # device-capacity compile failure is itself data
        print(f"plain bf16 compile FAILED on {jax.default_backend()} "
              f"({type(exc).__name__}): the {bf16_bytes/2**30:.2f} GiB "
              "full-precision program cannot even be built for this device — "
              "weight-only int8 is the only single-chip form at this scale.")
        # hoisting check without the plain baseline: hoisted dequants would
        # put ~the whole bf16 tree into temps.
        if mem.temp_size_in_bytes > 0.5 * bf16_bytes:
            print("dequant hoisting: DETECTED — mitigation needed")
        else:
            print(f"dequant hoisting: not detected (int8 temps "
                  f"{mem.temp_size_in_bytes/2**30:.2f} GiB << bf16 tree "
                  f"{bf16_bytes/2**30:.2f} GiB)")
        return
    print(f"compiled plain in {dt_plain:.1f}s", flush=True)
    report("plain", mem_plain)
    delta = mem.temp_size_in_bytes - mem_plain.temp_size_in_bytes
    print(f"int8 temp delta vs plain: {delta/2**30:+.2f} GiB "
          f"(hoisted-dequant signature would be ~+{bf16_bytes/2**30:.2f} GiB)")
    if delta > 0.5 * bf16_bytes:
        print("dequant hoisting: DETECTED — mitigation needed")
    else:
        print("dequant hoisting: not detected (dequants stay inside the loop)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Execute the FULL-scale FLUX.1 sampler (19+38 blocks, 11.9 B params).

Not a throughput bench — an existence proof. The full transformer has
never fit a 16 GB chip in bf16, so until the weight-only-int8 path
(models/quantize.py) every full-scale claim rested on AOT memory analysis
and block-count extrapolation. This runs the REAL 11.9 B-param program
end-to-end — host-side quantized tree build, transfer, jitted
encode -> N-step denoise -> decode — and reports wall time, peak RSS, and
output sanity. On CPU (tunnel down) it proves the program executes;
on the chip it doubles as the warm-up for sample_bench --blocks full.

  python benchmarks/full_scale_smoke.py --size 128 --steps 1
"""
from __future__ import annotations

import argparse
import resource
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
from ragb_vae_tpu.models.quantize import random_quantized_params_like
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.scheduler import FlowMatchEulerConfig, FlowMatchEulerScheduler
from ragb_vae_tpu.models.vae_config import AutoencoderConfig


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--steps", type=int, default=1)
    p.add_argument("--text-seq", type=int, default=512)
    args = p.parse_args()

    backend = jax.default_backend()
    # CPU emulates bf16 slowly; f32 keeps the smoke tractable there
    dtype = jnp.bfloat16 if backend == "tpu" else jnp.float32

    cfg = FluxTransformerConfig(
        in_channels=64,
        num_layers=19,
        num_single_layers=38,
        attention_head_dim=128,
        num_attention_heads=24,
        joint_attention_dim=4096,
        pooled_projection_dim=768,
        guidance_embeds=True,
    )
    vae_cfg = AutoencoderConfig.flux()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = args.size
    vae = RgbaVAE(config=vae_cfg, dtype=dtype)
    if backend == "tpu":
        vae.enable_fused()
    rng = np.random.default_rng(0)
    model = FluxTextAlphaModel(
        transformer_config=cfg,
        vae=vae,
        scheduler=FlowMatchEulerScheduler(FlowMatchEulerConfig()),
        prompt_embeds=jnp.asarray(
            rng.standard_normal((1, args.text_seq, cfg.joint_attention_dim)) * 0.02,
            dtype,
        ),
        pooled_prompt_embeds=jnp.asarray(
            rng.standard_normal((1, cfg.pooled_projection_dim)) * 0.02, dtype
        ),
        text_ids=jnp.zeros((args.text_seq, 3), jnp.float32),
        dtype=dtype,
        remat=True,
        weight_quant="int8",
    )

    dummy = dict(
        hidden_states=jnp.zeros((1, 8, cfg.in_channels), dtype),
        encoder_hidden_states=model.prompt_embeds,
        pooled_projections=model.pooled_prompt_embeds,
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((8, 3)),
        txt_ids=model.text_ids,
        guidance=jnp.asarray([3.5]),
    )
    plain = FluxTransformer2D(cfg, dtype=dtype)
    t0 = time.perf_counter()
    shapes = jax.eval_shape(lambda: plain.init(jax.random.PRNGKey(1), **dummy))[
        "params"
    ]
    n_params = sum(int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(shapes))
    t_params = random_quantized_params_like(shapes, seed=1)
    host_bytes = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(t_params))
    t_build = time.perf_counter() - t0
    print(
        f"[{backend}] built {n_params/1e9:.2f} B-param int8 tree host-side: "
        f"{host_bytes/2**30:.2f} GiB in {t_build:.0f}s"
    )

    # one-time transfer, timed separately — jit would otherwise re-ship the
    # host-numpy tree on every call (11.1 GiB through the tunnel each time)
    t0 = time.perf_counter()
    t_params = jax.block_until_ready(jax.device_put(t_params))
    print(f"[{backend}] params -> device: {time.perf_counter() - t0:.0f}s")

    vae_params = jax.tree_util.tree_map(
        lambda x: x.astype(dtype), vae.init_params(jax.random.PRNGKey(2), image_size=64)
    )
    gt = jnp.asarray(rng.random((1, args.size, args.size, 4)), jnp.float32)

    @jax.jit
    def sample(t_params, vae_params, gt, key):
        return model.sample(
            t_params, vae_params, gt, num_inference_steps=args.steps, key=key
        )

    t0 = time.perf_counter()
    out = np.asarray(sample(t_params, vae_params, gt, jax.random.PRNGKey(3)))
    t_run = time.perf_counter() - t0
    peak_gib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
    finite = bool(np.isfinite(out).all())
    print(
        f"[{backend}] full-scale {args.steps}-step sample at {args.size}px: "
        f"{t_run:.0f}s (compile+run), out {out.shape} in "
        f"[{out.min():.3f}, {out.max():.3f}], finite={finite}, "
        f"peak RSS {peak_gib:.1f} GiB"
    )
    if not finite:
        raise SystemExit("non-finite output")
    print("FULL-SCALE EXECUTION OK")


if __name__ == "__main__":
    main()

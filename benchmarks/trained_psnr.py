#!/usr/bin/env python
"""Kernel-stack numerics on TRAINED weights, not random init.

VERDICT r2 weak #4: `bench.py --metric psnr_delta` compares the fused bf16
JAX stack against the fp32 torch restatement on *random* weights
(`tests/torch_vae_ref.make_state`), which pins architecture/numerics but says
nothing about trained-checkpoint activation statistics — GroupNorm stats and
bf16 dynamic ranges on a converged network look nothing like N(0, 0.05²).

Real reference checkpoints are unreachable (no network), so this harness
manufactures trained statistics the only way available in-environment: run K
REAL training steps (the actual `make_train_step` path — AlphaVAE recon + KL,
AdamW(0.5, 0.9), bf16 compute, exactly the production step) on structured
synthetic RGBA images, then measure the fused-bf16-vs-torch-fp32
reconstruction-PSNR delta on held-out images THROUGH THE TRAINED WEIGHTS.

Training on sums of Gaussian soft blobs is not ImageNet, but after a few
hundred steps the GN scale/shift, conv spectra and activation ranges are
those of a network that has descended a real loss surface — the failure mode
weak #4 worries about (kernel-stack error blowing up on non-init statistics)
is exercised. Reference counterpart: the torch stack computes everything in
one dtype, so its "trained PSNR delta" is 0 by construction; ours must stay
<= 0.1 dB (BASELINE.json north star).

Usage (real run, on the TPU — queued in tpu_pending.sh while the tunnel is
down):   python benchmarks/trained_psnr.py --steps 300 --size 256
CPU smoke: python benchmarks/trained_psnr.py --tiny --steps 8 --size 64
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def structured_rgba(rng: np.random.Generator, n: int, size: int) -> np.ndarray:
    """(n, size, size, 4) RGBA in [0,1]: smooth color fields + soft alpha blobs.

    Mimics the layered-asset statistics the reference trains on
    (/root/reference/src/data_generation/prepare_rgba_buckets.py writes
    soft-edged foreground groups over flat/graded backgrounds): low-frequency
    chroma, alpha concentrated in a few soft components, hard-zero margins.
    """
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / max(size - 1, 1)
    out = np.empty((n, size, size, 4), np.float32)
    for i in range(n):
        # RGB: 2-3 superposed oriented gradients + a little band-limited noise
        rgb = np.zeros((size, size, 3), np.float32)
        for _ in range(int(rng.integers(2, 4))):
            theta = rng.uniform(0, 2 * np.pi)
            ramp = np.cos(theta) * xx + np.sin(theta) * yy
            color = rng.uniform(0, 1, size=3).astype(np.float32)
            rgb += ramp[..., None] * color
        rgb += rng.normal(0, 0.05, size=rgb.shape).astype(np.float32)
        rgb -= rgb.min()
        rgb /= max(float(rgb.max()), 1e-6)
        # alpha: union of soft Gaussian blobs (blob count/shape per-image)
        alpha = np.zeros((size, size), np.float32)
        for _ in range(int(rng.integers(1, 5))):
            cx, cy = rng.uniform(0.15, 0.85, size=2)
            sx, sy = rng.uniform(0.05, 0.3, size=2)
            blob = np.exp(-(((xx - cx) / sx) ** 2 + ((yy - cy) / sy) ** 2))
            alpha = np.maximum(alpha, blob.astype(np.float32))
        alpha = np.clip((alpha - 0.1) / 0.9, 0.0, 1.0) ** 0.7
        out[i, ..., :3] = rgb
        out[i, ..., 3] = alpha
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = max(float(np.mean((a - b) ** 2)), 1e-10)
    return -10.0 * math.log10(mse)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300, help="real train steps")
    p.add_argument("--size", type=int, default=256, help="train/eval resolution")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--eval-images", type=int, default=4)
    p.add_argument("--tiny", action="store_true", help="tiny config (CPU smoke)")
    p.add_argument("--no-fused", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from ragb_vae_tpu.models.rgba_vae import RgbaVAE
    from ragb_vae_tpu.models.vae_config import AutoencoderConfig
    from ragb_vae_tpu.models.weights import (
        flax_params_to_torch_state,
        torch_state_to_flax_params,
    )
    from ragb_vae_tpu.training.vae_step import (
        VaeStepConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from ragb_vae_tpu.models.losses import AlphaVaeLossConfig
    from tests.torch_vae_ref import TorchVAERef, make_state

    if args.tiny:
        config = AutoencoderConfig(
            in_channels=4,
            out_channels=4,
            block_out_channels=(32, 64),
            layers_per_block=1,
            latent_channels=4,
            norm_num_groups=8,
        )
    else:
        config = AutoencoderConfig.flux()
        config.in_channels = 4
        config.out_channels = 4

    state0 = make_state(config, seed=0)
    params = torch_state_to_flax_params(state0)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    model = RgbaVAE(config=config, dtype=jnp.bfloat16, fused=not args.no_fused)
    tx = make_optimizer(args.lr, max_grad_norm=1.0)
    step_cfg = VaeStepConfig(kl_scale=1e-6, compute_dtype=jnp.bfloat16)
    train_step = make_train_step(
        model, tx, AlphaVaeLossConfig(), step_cfg, donate=False
    )
    opt_state = init_train_state(model, params, tx)

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    loss0 = loss = None
    for i in range(args.steps):
        batch = {"images": jnp.asarray(structured_rgba(rng, args.batch, args.size))}
        key, sub = jax.random.split(key)
        params, opt_state, metrics = train_step(params, opt_state, batch, sub)
        loss = float(metrics["train/loss"])
        if loss0 is None:
            loss0 = loss
        if not np.isfinite(loss):
            raise SystemExit(f"non-finite loss at step {i}")
        if i % max(args.steps // 10, 1) == 0:
            print(f"[trained_psnr] step {i}: loss {loss:.5f}", file=sys.stderr)
    train_s = time.time() - t0
    print(
        f"[trained_psnr] {args.steps} steps in {train_s:.1f}s; "
        f"loss {loss0:.5f} -> {loss:.5f}",
        file=sys.stderr,
    )

    # --- numerics on the TRAINED weights -----------------------------------
    eval_rng = np.random.default_rng(1234)  # held out from training stream
    x = structured_rgba(eval_rng, args.eval_images, args.size)

    fwd = jax.jit(
        lambda p, v: model.forward(p, v, jax.random.PRNGKey(0), sample=False)
    )
    recon_jax = np.asarray(fwd(params, jnp.asarray(x))[0])

    state_t = flax_params_to_torch_state(jax.device_get(params))
    ref = TorchVAERef(config, state_t)
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2) * 2.0 - 1.0
        moments = ref.encode_moments(xt)
        z = moments.chunk(2, dim=1)[0]  # posterior mode
        recon_t = ref.decode(z).clamp(-1, 1)
        recon_torch = ((recon_t + 1) / 2).permute(0, 2, 3, 1).numpy()

    p_jax = psnr(recon_jax, x)
    p_torch = psnr(recon_torch, x)
    delta = abs(p_jax - p_torch)
    per_image = [
        abs(psnr(recon_jax[i], x[i]) - psnr(recon_torch[i], x[i]))
        for i in range(x.shape[0])
    ]
    print(
        f"[trained_psnr] trained-recon PSNR jax-bf16 {p_jax:.3f} dB, "
        f"torch-fp32 {p_torch:.3f} dB (per-image deltas: "
        + ", ".join(f"{d:.4f}" for d in per_image)
        + ")",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"trained_psnr_delta_vs_torch_{args.size}px",
                "value": round(delta, 4),
                "unit": "dB",
                "vs_baseline": round(0.1 / max(delta, 1e-4), 3),
                "train_steps": args.steps,
                "loss_start": round(loss0, 5),
                "loss_end": round(loss, 5),
                "max_per_image_delta": round(max(per_image), 4),
            }
        )
    )


if __name__ == "__main__":
    main()

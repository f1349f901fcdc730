#!/usr/bin/env python
"""Headline benchmark: RGBA-VAE encode+decode throughput at 1024².

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.json `published: {}`); the
baseline constant below is the A100 estimate for the same Flux-arch VAE
encode+decode at 1024² in bf16 (~8 img/s: SDXL-class VAE decode ≈
70-100 ms + encode ≈ 30-40 ms per 1024² image on A100), matching the
north-star target "matches A100 images/sec/chip".
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_A100_IMG_PER_S = 8.0


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--batches", type=int, nargs="*", default=[4, 2, 1])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ragb_vae_tpu.models.rgba_vae import RgbaVAE
    from ragb_vae_tpu.models.vae_config import AutoencoderConfig

    device = jax.devices()[0]
    log(f"[bench] device: {device.platform} {getattr(device, 'device_kind', '?')}")

    config = AutoencoderConfig.flux()
    config.in_channels = 4
    config.out_channels = 4
    model = RgbaVAE(config=config, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0), image_size=64)
    params = jax.device_put(params, device)

    @jax.jit
    def encode_decode(params, x, key):
        recon, _ = model.forward(params, x, key)
        return recon

    value = None
    used_batch = None
    for batch in args.batches:
        try:
            x = jax.device_put(
                np.random.default_rng(0).random((batch, args.size, args.size, 4)).astype(np.float32),
                device,
            )
            key = jax.random.PRNGKey(1)

            def run(i):
                out = encode_decode(params, x, jax.random.fold_in(key, i))
                # fetch a scalar: forces true completion even if
                # block_until_ready returns early on tunneled backends
                return float(jnp.mean(out[:, ::256, ::256, 0]))

            for i in range(args.warmup):
                run(1000 + i)
            times = []
            for i in range(args.iters):
                t0 = time.perf_counter()
                run(i)
                times.append(time.perf_counter() - t0)
            log(f"[bench] per-iter seconds: {[round(t, 4) for t in times]}")
            value = batch * args.iters / sum(times)
            used_batch = batch
            break
        except Exception as exc:  # OOM at this batch — try smaller
            log(f"[bench] batch {batch} failed: {type(exc).__name__}: {exc}")
            continue

    if value is None:
        raise SystemExit("bench failed at every batch size")

    log(f"[bench] batch {used_batch}, {args.iters} iters -> {value:.3f} img/s")
    print(
        json.dumps(
            {
                "metric": f"rgba_vae_encode_decode_{args.size}px_bf16",
                "value": round(value, 3),
                "unit": "img/s/chip",
                "vs_baseline": round(value / BASELINE_A100_IMG_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""LPIPS training-cost variants on the real chip (round 4).

The 1024^2 microbatch-2 OOM dump (benchmarks/logs/r4/offload_1024.log)
shows the LPIPS VGG stack is the second-largest activation consumer and
pays heavy layout padding: XLA lays the remat'd conv inputs out as
{3,0,2,1:T(4,128)} so the C=3 scaled input pads 42.7x (24 MB -> 1.0 GB)
and every C=64 full-res activation pads 2x. This bench measures, at the
512^2 training operating point, value+grad of the perceptual term for:

  batched   — the shipped path: black/white composites concatenated into
              one 2B-batch VGG pass per stream (lpips.py maybe_build_lpips)
  mapped    — lax.map per SAMPLE (each element runs its 2-composite
              micro-batch); per-sample slicing is the repo's standard
              single-chip workaround for batch-layout pathologies and
              uses only XLA-native convs, so the pallas-in-scan rule
              (results.md round 1) does not apply
  mapped2   — lax.map over PAIRS of samples (half the sequential length,
              double the live activation set)

Values must agree bitwise-ish (same math, different scheduling); the
question is time and peak memory. Usage:
  python benchmarks/lpips_variants.py --size 512 --batch 4 [--iters 8]
"""
from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ragb_vae_tpu.models.lpips import load_lpips_params, lpips_distance
    from ragb_vae_tpu.models.losses import perceptual_composites
    from ragb_vae_tpu.models.weights import save_torch_state
    from tests.torch_lpips_ref import make_lpips_state

    tmp = Path(tempfile.mkdtemp()) / "lpips_vgg.safetensors"
    save_torch_state(make_lpips_state(seed=0), tmp)
    params = load_lpips_params(tmp)

    rng = np.random.default_rng(0)
    b, s = args.batch, args.size
    pred = jnp.asarray(rng.random((b, s, s, 4), np.float32) * 2 - 1)
    target = jnp.asarray(rng.random((b, s, s, 4), np.float32) * 2 - 1)
    w = jnp.ones((b,), jnp.float32)

    def batched(pred, target, w):
        pb, tb, pw, tw = perceptual_composites(pred, target)
        d = lpips_distance(
            jnp.concatenate([pb, pw], axis=0),
            jnp.concatenate([tb, tw], axis=0),
            params,
            compute_dtype=jnp.bfloat16,
        )
        per = 0.5 * (d[:b] + d[b:])
        return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-8)

    def _one(pred1, target1):
        # pred1/target1: (k, H, W, 4) micro-slice
        pb, tb, pw, tw = perceptual_composites(pred1, target1)
        k = pred1.shape[0]
        d = lpips_distance(
            jnp.concatenate([pb, pw], axis=0),
            jnp.concatenate([tb, tw], axis=0),
            params,
            compute_dtype=jnp.bfloat16,
        )
        return 0.5 * (d[:k] + d[k:])

    def mapped_k(k):
        def f(pred, target, w):
            ps = pred.reshape(b // k, k, *pred.shape[1:])
            ts = target.reshape(b // k, k, *target.shape[1:])
            per = jax.lax.map(lambda pt: _one(*pt), (ps, ts)).reshape(b)
            return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-8)

        return f

    variants = {
        "batched": batched,
        "mapped": mapped_k(1),
        "mapped2": mapped_k(2) if b % 2 == 0 else None,
    }

    for name, fn in variants.items():
        if fn is None:
            continue
        vg = jax.jit(jax.value_and_grad(fn))
        val, grad = vg(pred, target, w)
        val = float(val)
        gnorm = float(
            jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in [grad]))
        )
        t0 = time.perf_counter()
        for i in range(args.iters):
            val_i, grad = vg(pred + 0.0 * i, target, w)
            jax.block_until_ready(grad)
        dt = (time.perf_counter() - t0) / args.iters
        mem = vg.lower(pred, target, w).compile().memory_analysis()
        temp_gb = getattr(mem, "temp_size_in_bytes", 0) / 2**30
        print(
            f"{name:8s} val={val:.6f} |g|={gnorm:.4f} "
            f"{dt*1e3:8.1f} ms/call  temps {temp_gb:.2f} GiB"
        )


if __name__ == "__main__":
    main()

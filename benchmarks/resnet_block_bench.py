#!/usr/bin/env python
"""Fused whole-resnet-block kernels vs the XLA block, hot VAE shapes.

Measures a CHAIN of 3 blocks (the decoder runs layers_per_block+1 = 3 per
level) so the stats-chaining epilogue is exercised, at batch 1/2/4.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import ragb_vae_tpu.ops.pallas.resnet_block as rb

SHAPES = [  # (H, W, C)
    (1024, 1024, 128),
    (512, 512, 256),
    (256, 256, 512),
]
ITERS = 10
N_BLOCKS = 3


def timed(fn, *args, iters=ITERS):
    @jax.jit
    def chain(*a):
        def body(i, carry):
            out = fn(*((carry,) + a[1:]))
            return carry * 0.9999 + jnp.mean(out).astype(carry.dtype) * 1e-6

        return lax.fori_loop(0, iters, body, a[0] * 1.0)

    float(jnp.sum(chain(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def make_params(c, seed):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    return {
        "norm1": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "conv1": {"kernel": mk(3, 3, c, c), "bias": mk(c)},
        "norm2": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))},
        "conv2": {"kernel": mk(3, 3, c, c), "bias": mk(c)},
    }


def main() -> None:
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    for h, w, c in SHAPES:
        plist = [make_params(c, i) for i in range(N_BLOCKS)]
        flops = N_BLOCKS * 2 * 2 * 9 * h * w * c * c  # per image

        def fused(x_):
            stats = None
            for p in plist:
                x_, stats = rb.fused_resnet_block(x_, p, num_groups=32, stats=stats)
            return x_

        def xla(x_):
            stats = None
            for p in plist:
                x_, stats = rb.fused_resnet_block(
                    x_, p, num_groups=32, stats=stats, force_xla=True
                )
            return x_

        row = [f"{h}x{w}x{c} (3 blocks):"]
        for bsz in (1, 2, 4):
            x = jnp.asarray(rng.random((bsz, h, w, c)), jnp.bfloat16)
            tf = timed(fused, x) / bsz
            tx = timed(xla, x) / bsz
            row.append(
                f"b{bsz} fused {tf*1e3:6.2f}ms ({flops/tf/1e12:5.1f}TF/s) "
                f"xla {tx*1e3:6.2f} ({flops/tx/1e12:5.1f})"
            )
        print(" | ".join(row))


if __name__ == "__main__":
    main()

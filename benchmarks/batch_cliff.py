#!/usr/bin/env python
"""Root-cause probe for the batch>=2 conv cliff (VERDICT item 3).

Observed: per-image VAE forward time doubles from batch 1 to batch 2+
at 1024^2 even in-graph (benchmarks/results.md). This probe isolates
WHERE: a single conv op, a GN+SiLU+conv chain, and equivalent
reformulations, each at batch 1/2/4, per-image time reported.

Reformulations tested per shape:
  conv_bN    — lax.conv at batch N (the suspect)
  fold_h     — batch folded into H: (1, N*H, W, C); same FLOPs, one
               sample's rows contiguous (halo rows cross samples —
               perf probe only, not numerically a batched conv)
  two_progs  — N independent batch-1 convs in one jit (what lax.map
               slicing approximates without the scan machinery)
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

SHAPES = [  # (H, W, C_in, C_out)
    (1024, 1024, 128, 128),
    (512, 512, 256, 256),
    (256, 256, 512, 512),
]
ITERS = 20


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


def conv(x_, k_):
    return lax.conv_general_dilated(
        x_, k_, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def main() -> None:
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    for h, w, cin, cout in SHAPES:
        k = jnp.asarray(rng.random((3, 3, cin, cout)) * 0.1, jnp.bfloat16)
        flops1 = 2 * 9 * h * w * cin * cout  # per image
        row = [f"{h}x{w}x{cin}->{cout}:"]
        for bsz in (1, 2, 4):
            x = jnp.asarray(rng.random((bsz, h, w, cin)), jnp.bfloat16)
            t = timed(conv, x, k) / bsz
            row.append(f"b{bsz} {t*1e3:6.2f}ms/img ({flops1/t/1e12:5.1f} TF/s)")
        # batch folded into H (perf-only: halo crosses samples)
        x2 = jnp.asarray(rng.random((1, 2 * h, w, cin)), jnp.bfloat16)
        t = timed(conv, x2, k) / 2
        row.append(f"foldH2 {t*1e3:6.2f}")
        # two independent batch-1 convs in one program
        xa = jnp.asarray(rng.random((1, h, w, cin)), jnp.bfloat16)
        xb = jnp.asarray(rng.random((1, h, w, cin)), jnp.bfloat16)

        def two(x_, xb_, k_):
            return conv(x_, k_) + 0.0 * jnp.mean(conv(xb_, k_))

        t = timed(two, xa, xb, k) / 2
        row.append(f"2prog {t*1e3:6.2f}")
        print(" | ".join(row))


if __name__ == "__main__":
    main()

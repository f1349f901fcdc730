#!/usr/bin/env python
"""Variant probe for the fused chain kernel at the b4@512^2x256 regression."""
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

ITERS = 10


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


def main() -> None:
    rb.MAX_VMEM_BYTES = 28 * 1024 * 1024  # let tile_h=8 engage (probe only)
    for (h, c), batches in (((512, 256), (2, 4, 8)), ((256, 512), (1, 2))):
        w = h
        run_shape(h, w, c, batches)


def run_shape(h, w, c, batches) -> None:
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    flops = 2 * 9 * h * w * c * c

    for bsz in batches:
        x = jnp.asarray(rng.random((bsz, h, w, c)), jnp.bfloat16)
        a = jnp.ones((bsz, c), jnp.float32)
        b = jnp.zeros((bsz, c), jnp.float32)
        skip = jnp.asarray(rng.random((bsz, h, w, c)), jnp.bfloat16)
        row = [f"{h}x{w}x{c} b{bsz}"]
        for tag, fn, extras in (
            ("noskip_t4",
             lambda x_, a_, b_, k_, bias_: rb.gn_silu_conv3x3_stats(x_, a_, b_, k_, bias_, tile_h=4)[0],
             (a, b, k, bias)),
            ("skip_t4",
             lambda x_, a_, b_, k_, bias_, s_: rb.gn_silu_conv3x3_stats(x_, a_, b_, k_, bias_, s_, tile_h=4)[0],
             (a, b, k, bias, skip)),
            ("noskip_t8",
             lambda x_, a_, b_, k_, bias_: rb.gn_silu_conv3x3_stats(x_, a_, b_, k_, bias_, tile_h=8)[0],
             (a, b, k, bias)),
        ):
            t = timed(fn, x, *extras) / bsz
            row.append(f"{tag} {t*1e3:6.2f}ms ({flops/t/1e12:5.1f}TF/s)")
        print(" | ".join(row), flush=True)


if __name__ == "__main__":
    main()

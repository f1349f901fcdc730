#!/usr/bin/env python
"""Subpixel upsample-conv kernel vs literal XLA nearest+conv3x3, the
decoder's three upsample shapes (b8 @1024^2-model)."""
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

SHAPES = [  # (small_h, c) -> out 2h x 2h x c
    (128, 512),
    (256, 512),
    (512, 256),
]
ITERS = 8
BATCH = 8


def timed(fn, *args):
    @jax.jit
    def chain(*a):
        def body(i, c):
            y, _ = fn(c, *a[1:])
            # fold the big output back to carry shape cheaply
            return c + jnp.mean(y).astype(c.dtype) * 1e-6

        return lax.fori_loop(0, ITERS, body, a[0])

    float(jnp.sum(chain(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    for h, c in SHAPES:
        x = jnp.asarray(rng.standard_normal((BATCH, h, h, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
        flops = 2 * 9 * 4 * h * h * c * c  # literal-conv FLOPs per image
        t_sub = timed(rb.fused_upsample_conv3x3_stats, x, w, bias) / BATCH
        t_xla = timed(rb._xla_upsample_conv, x, w, bias) / BATCH
        # one-shot parity on-chip
        y1, _ = jax.jit(rb.fused_upsample_conv3x3_stats)(x[:1], w, bias)
        y2, _ = jax.jit(rb._xla_upsample_conv)(x[:1], w, bias)
        err = float(jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32))))
        print(
            f"{h}->{2*h} x{c}: subpixel {t_sub*1e3:7.2f}ms ({flops/t_sub/1e12:5.1f}TF/s-eq) "
            f"| xla {t_xla*1e3:7.2f}ms ({flops/t_xla/1e12:5.1f}) | max-err {err:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

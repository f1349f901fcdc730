#!/usr/bin/env python
"""Fused Pallas subpixel backward vs the XLA-replay VJP at the decoder's
upsample shapes (training operating points: 512^2 b4 and 1024^2 b1)."""
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

# (batch, small_h, c): decoder upsamples at 512^2 b4 and 1024^2 b1
SHAPES = [
    (4, 64, 512),
    (4, 128, 512),
    (4, 256, 256),
    (1, 128, 512),
    (1, 256, 512),
    (1, 512, 256),
]
ITERS = 8


def timed(fn, *args):
    @jax.jit
    def chain(*a):
        def body(i, c):
            outs = fn(c, *a[1:])
            return c + jnp.mean(outs[0]).astype(c.dtype) * 1e-6

        return lax.fori_loop(0, ITERS, body, a[0])

    float(jnp.sum(chain(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    for bsz, h, c in SHAPES:
        x = jnp.asarray(rng.standard_normal((bsz, h, h, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)
        bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
        gy = jnp.asarray(
            rng.standard_normal((bsz, 2 * h, 2 * h, c)) * 0.1, jnp.bfloat16
        )
        gs = jnp.asarray(rng.standard_normal((bsz, 2, c)) * 0.01, jnp.float32)

        def grad_call(x_, w_, b_, gy_, gs_):
            _, vjp = jax.vjp(
                lambda xx, ww, bb: rb.fused_upsample_conv3x3_stats(xx, ww, bb),
                x_, w_, b_,
            )
            return vjp((gy_, gs_))

        def xla_grad_call(x_, w_, b_, gy_, gs_):
            _, vjp = jax.vjp(
                lambda xx, ww, bb: rb._xla_upsample_conv(xx, ww, bb), x_, w_, b_
            )
            return vjp((gy_, gs_))

        tk = timed(grad_call, x, w, bias, gy, gs)
        tx = timed(xla_grad_call, x, w, bias, gy, gs)
        print(
            f"b{bsz} {h}->{2*h} C{c}: kernel {tk*1e3:7.2f} ms | "
            f"xla-vjp {tx*1e3:7.2f} ms | {tx/tk:4.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()

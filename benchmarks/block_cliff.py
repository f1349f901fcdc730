#!/usr/bin/env python
"""Bisect the batch>=2 e2e cliff: which sub-op of the VAE degrades?

batch_cliff.py showed the conv op itself has NO cliff (batch 4 is faster
per image). This probes the composite ops at batch 1/2/4:
  gn      — FastGroupNorm alone (fp32 stats + bf16 apply)
  gnchain — GN + SiLU + conv (the ResnetBlock half)
  block   — full ResnetBlock (2 chains + residual)
  upsamp  — nearest 2x + conv3x3 (Upsample)
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


def gn(x, scale, bias, groups=32, eps=1e-6):
    b, h, w, c = x.shape
    grouped = x.reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(grouped, axis=(1, 3), dtype=jnp.float32)
    meansq = jnp.mean(jnp.square(grouped.astype(jnp.float32)), axis=(1, 3), dtype=jnp.float32)
    rstd = lax.rsqrt(meansq - jnp.square(mean) + eps)
    rstd_c = jnp.repeat(rstd, c // groups, axis=1)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    a = scale[None, :] * rstd_c
    bc = bias[None, :] - mean_c * a
    return x * a.reshape(b, 1, 1, c).astype(x.dtype) + bc.reshape(b, 1, 1, c).astype(x.dtype)


def main() -> None:
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    h = w = 1024
    c = 128
    k = jnp.asarray(rng.random((3, 3, c, c)) * 0.1, jnp.bfloat16)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)

    def conv(x_):
        return lax.conv_general_dilated(
            x_, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def gnchain(x_):
        t = gn(x_, scale, bias)
        return conv(jax.nn.silu(t))

    def block(x_):
        t = gnchain(x_)
        t = gnchain(t)
        return x_ + t

    def upsamp(x_):
        up = jnp.repeat(jnp.repeat(x_, 2, axis=1), 2, axis=2)
        return lax.conv_general_dilated(
            up, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    for name, fn, hh in (("gn", lambda x_: gn(x_, scale, bias), h),
                         ("gnchain", gnchain, h),
                         ("block", block, h),
                         ("upsamp", upsamp, h // 2)):
        row = [f"{name:8s}"]
        for bsz in (1, 2, 4):
            x = jnp.asarray(rng.random((bsz, hh, hh, c)), jnp.bfloat16)
            t = timed(fn, x) / bsz
            row.append(f"b{bsz} {t*1e3:7.2f}ms/img")
        print(" | ".join(row))


if __name__ == "__main__":
    main()

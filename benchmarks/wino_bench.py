#!/usr/bin/env python
"""In-VMEM Winograd F(2x2,3x3) chain kernel vs the direct (K=3C) kernel.

Single-chain (one gn+silu+conv3x3 launch) timings at the VAE's hot
shapes, batch 1/4, bf16, plus numerics deltas. The direct kernel's cells
measured 111-143 TF/s effective (results.md:100-104); Winograd computes
the same output at 4/9 the MACs, so matching GEMM rate would show ~2.25x.
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

SHAPES = [  # (H, W, C, N)
    (1024, 1024, 128, 128),
    (512, 512, 256, 256),
    (256, 256, 512, 512),
    (128, 128, 512, 512),
]
ITERS = 10


def timed(fn, *args, iters=ITERS):
    @jax.jit
    def chain(*a):
        def body(i, carry):
            out, _ = fn(*((carry,) + a[1:]))
            return carry * 0.9999 + out * 1e-6

        return lax.fori_loop(0, iters, body, a[0] * 1.0)

    float(jnp.sum(chain(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    for h, w, c, n in SHAPES:
        for bsz in (1, 4):
            x = jnp.asarray(rng.standard_normal((bsz, h, w, c)), jnp.bfloat16)
            a = jnp.asarray(rng.standard_normal((bsz, c)) * 0.3 + 1.0, jnp.float32)
            b = jnp.asarray(rng.standard_normal((bsz, c)) * 0.1, jnp.float32)
            wk = jnp.asarray(rng.standard_normal((3, 3, c, n)) * 0.05, jnp.float32)
            bias = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)

            flops = 2 * 9 * bsz * h * w * c * n  # direct-conv MACs x2

            def direct(x, a, b, wk, bias):
                return rb.gn_silu_conv3x3_stats(x, a, b, wk, bias, algo="direct")

            def wino(x, a, b, wk, bias):
                return rb.gn_silu_conv3x3_stats(x, a, b, wk, bias, algo="winograd")

            try:
                t_d = timed(direct, x, a, b, wk, bias)
            except Exception as e:
                print(f"{h}x{w}x{c}->{n} b{bsz} direct FAILED: {type(e).__name__}: {e}")
                t_d = None
            try:
                t_w = timed(wino, x, a, b, wk, bias)
            except Exception as e:
                print(f"{h}x{w}x{c}->{n} b{bsz} wino FAILED: {type(e).__name__}: {e}")
                t_w = None
            if t_d and t_w:
                y_d, _ = jax.jit(direct)(x, a, b, wk, bias)
                y_w, _ = jax.jit(wino)(x, a, b, wk, bias)
                err = float(
                    jnp.max(jnp.abs(y_d.astype(jnp.float32) - y_w.astype(jnp.float32)))
                )
                scale = float(jnp.max(jnp.abs(y_d.astype(jnp.float32))))
                print(
                    f"{h}x{w}x{c}->{n} b{bsz}: direct {t_d*1e3:7.3f} ms "
                    f"({flops/t_d/1e12:6.1f} TF/s eff) | wino {t_w*1e3:7.3f} ms "
                    f"({flops/t_w/1e12:6.1f} TF/s eff) | speedup {t_d/t_w:5.2f}x "
                    f"| maxerr {err:.4f} (scale {scale:.1f})"
                )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Microbench: 3x3-conv formulations on the real chip (chained timing).

Why: the 1024^2 VAE forward runs at ~22% MXU peak and it is all conv
(benchmarks/results.md). Hypothesis: K=C contractions (C=128/256) are too
shallow for the MXU pipeline; an im2col formulation contracts over 9*C.

Formulations per shape:
  conv      — lax.conv_general_dilated NHWC (the model's current op)
  patches   — lax.conv_general_dilated_patches (im2col) + one dot_general
  gemm_only — the bare (M, 9C) x (9C, N) GEMM (upper bound; no im2col cost)
  dot_c     — the bare (M, C) x (C, N) GEMM x9 (models the implicit-GEMM
              kernel's 9 accumulated taps)
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
    """Chained in-graph timing (amortizes the ~30 ms tunnel RPC)."""

    @jax.jit
    def chain(*a):
        def body(i, carry):
            out = fn(*((carry,) + a[1:]))
            # keep shapes stable: re-inject slice of out into carry
            return carry * 0.9999 + jnp.mean(out) * 1e-6

        return lax.fori_loop(0, iters, body, a[0] * 1.0)

    float(jnp.sum(chain(*args)))  # compile+warm
    t0 = time.perf_counter()
    float(jnp.sum(chain(*args)))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    print(f"device: {jax.devices()[0]}")
    for h, w, cin, cout in SHAPES:
        x = jnp.asarray(np.random.default_rng(0).random((1, h, w, cin)), jnp.bfloat16)
        k = jnp.asarray(np.random.default_rng(1).random((3, 3, cin, cout)) * 0.1, jnp.bfloat16)
        k2 = k.reshape(9 * cin, cout)
        m = h * w
        flops = 2 * 9 * m * cin * cout

        def conv(x_, k_=k):
            return lax.conv_general_dilated(
                x_, k_, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )

        def patches(x_, k2_=k2):
            p = lax.conv_general_dilated_patches(
                x_, (3, 3), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )  # (1, H, W, 9*cin)
            return lax.dot_general(
                p.reshape(m, 9 * cin), k2_,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        big = jnp.asarray(np.random.default_rng(2).random((m, 9 * cin)) * 0.1, jnp.bfloat16)

        def gemm_only(b_, k2_=k2):
            return lax.dot_general(
                b_, k2_, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)

        xs = jnp.asarray(np.random.default_rng(3).random((m, cin)) * 0.1, jnp.bfloat16)
        kc = k[1, 1]

        def dot_c(x_, kc_=kc):
            acc = None
            for _ in range(9):
                d = lax.dot_general(
                    x_, kc_, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                acc = d if acc is None else acc + d
            return acc.astype(jnp.bfloat16)

        t_conv = timed(conv, x)
        t_pat = timed(patches, x)
        t_gemm = timed(gemm_only, big)
        t_dotc = timed(dot_c, xs)
        print(
            f"{h}x{w}x{cin}->{cout}: conv {t_conv*1e3:7.2f} ms ({flops/t_conv/1e12:5.1f} TF/s) | "
            f"patches {t_pat*1e3:7.2f} ({flops/t_pat/1e12:5.1f}) | "
            f"gemm9C {t_gemm*1e3:7.2f} ({flops/t_gemm/1e12:5.1f}) | "
            f"9xgemmC {t_dotc*1e3:7.2f} ({flops/t_dotc/1e12:5.1f})"
        )


if __name__ == "__main__":
    main()

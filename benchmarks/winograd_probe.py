#!/usr/bin/env python
"""Winograd F(2x2, 3x3) conv in pure XLA vs the direct conv — round-3
feasibility probe. The block convs are MXU-ceiling-bound at C=128
(~110 TF/s for any direct GEMM formulation); Winograd trades 2.25x fewer
MACs for elementwise tile transforms. If even an untuned XLA version
lands near the direct conv, an in-kernel version (which would fuse the
transforms into the GEMM staging) is promising.
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

# F(2x2, 3x3) transform matrices (Lavin & Gray 2015)
BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
G = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)

ITERS = 8
BATCH = 1  # the (4,4,B,h2,w2,C) transform tensors are ~1 GB each at b1 already


def winograd_conv(x, w):
    """x: (B, H, W, C) bf16, H/W even; w: (3, 3, C, N). SAME padding."""
    b, h, w_dim, c = x.shape
    n = w.shape[-1]
    h2, w2 = h // 2, w_dim // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # U = G g G^T per (C, N): precomputable at load time in a real model
    U = jnp.einsum(
        "ka,abcn,lb->klcn", jnp.asarray(G), w.astype(jnp.float32), jnp.asarray(G)
    ).astype(x.dtype)  # (4, 4, C, N)

    # d[a, b]: (B, h2, w2, C) strided views of the padded input
    d = jnp.stack(
        [
            jnp.stack(
                [xp[:, a : a + h : 2, bb : bb + w_dim : 2, :] for bb in range(4)],
                axis=0,
            )
            for a in range(4)
        ],
        axis=0,
    )  # (4, 4, B, h2, w2, C)

    # V = B^T d B (entries in {0, +-1}: pure adds)
    bt = jnp.asarray(BT, x.dtype)
    V = jnp.einsum("ka,ab...,lb->kl...", bt, d.astype(x.dtype), bt)

    # 16 batched GEMMs over (B*h2*w2, C) x (C, N)
    M = jnp.einsum("kl...c,klcn->kl...n", V, U)  # (4,4,B,h2,w2,N) fp32? bf16

    # Y = A^T M A -> (2, 2, B, h2, w2, N)
    at = jnp.asarray(AT, M.dtype)
    Y = jnp.einsum("pk,kl...,ql->pq...", at, M, at)

    # interleave 2x2 output parities back to (B, H, W, N)
    Y = Y.transpose(2, 3, 0, 4, 1, 5)  # (B, h2, p, w2, q, N)
    return Y.reshape(b, h, w_dim, n)


def main() -> None:
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    for h, c in ((1024, 128), (512, 256)):
        x = jnp.asarray(rng.standard_normal((BATCH, h, h, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)

        def direct(x_, w_):
            return lax.conv_general_dilated(
                x_, w_, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )

        y1 = jax.jit(direct)(x[:1], w)
        y2 = jax.jit(winograd_conv)(x[:1], w)
        err = float(
            jnp.max(jnp.abs(y1.astype(jnp.float32) - y2.astype(jnp.float32)))
        )

        def timed(fn, *args):
            @jax.jit
            def chain(*a):
                def body(i, cc):
                    return cc + jnp.mean(fn(cc, *a[1:])).astype(cc.dtype) * 1e-6

                return lax.fori_loop(0, ITERS, body, a[0])

            float(jnp.sum(chain(*args).astype(jnp.float32)))
            t0 = time.perf_counter()
            float(jnp.sum(chain(*args).astype(jnp.float32)))
            return (time.perf_counter() - t0) / ITERS

        t_d = timed(direct, x, w) / BATCH
        t_w = timed(winograd_conv, x, w) / BATCH
        flops = 2 * 9 * h * h * c * c
        print(
            f"{h}x{h}x{c}: direct {t_d*1e3:7.2f}ms ({flops/t_d/1e12:5.1f}TF/s) | "
            f"winograd {t_w*1e3:7.2f}ms ({flops/t_w/1e12:5.1f}TF/s-eq) | max-err {err:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

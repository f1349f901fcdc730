"""Does XLA:TPU fuse weight dequantization into the matmul, or does the
dequantized bf16 weight round-trip HBM?

The QDense int8 path (models/flux_transformer.py:162-172) computes
``x @ (q.astype(f32) * scale).astype(bf16)``.  If XLA materializes the
dequantized weights, every full-scale FLUX.1 eval pays an extra ~24 GB
HBM write+read on top of the 11.9 GB int8 read — worth a fused Pallas
kernel.  If XLA fuses the convert+scale into the dot's operand load, a
kernel is pointless (the wire-and-measure rule, benchmarks/results.md).

Measures, per shape: pure-bf16 matmul, the QDense dequant pattern, and
the scale-after-dot rewrite ``(x @ q.astype(bf16)) * scale`` (exact for
int8 magnitudes; moves the per-output-channel scale into a cheap
epilogue so only the int8->bf16 convert sits on the dot operand).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters: int = 20) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    # FLUX.1-scale GEMMs: inner_dim 3072; ff 12288; seq 1536 (512²+text)
    # and 4608 (1024²+text).
    shapes = [(1536, 3072, 12288), (4608, 3072, 12288), (4608, 12288, 3072)]
    rng = np.random.default_rng(0)
    for m, k, n in shapes:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        q = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        s = jnp.asarray(rng.random((n,)) * 0.02, jnp.float32)

        bf16 = jax.jit(lambda x, w: x @ w)
        deq = jax.jit(
            lambda x, q, s: x @ (q.astype(jnp.float32) * s[None, :]).astype(jnp.bfloat16)
        )
        epi = jax.jit(
            lambda x, q, s: ((x @ q.astype(jnp.bfloat16)).astype(jnp.float32) * s[None, :]).astype(jnp.bfloat16)
        )

        t_bf16 = timed(bf16, x, w)
        t_deq = timed(deq, x, q, s)
        t_epi = timed(epi, x, q, s)
        tf = 2 * m * k * n / 1e12
        print(
            f"[{m}x{k}x{n}] bf16 {t_bf16*1e3:7.2f} ms ({tf/t_bf16:6.1f} TF/s) | "
            f"dequant-into-dot {t_deq*1e3:7.2f} ms ({tf/t_deq:6.1f} TF/s) | "
            f"scale-epilogue {t_epi*1e3:7.2f} ms ({tf/t_epi:6.1f} TF/s)"
        )


if __name__ == "__main__":
    main()

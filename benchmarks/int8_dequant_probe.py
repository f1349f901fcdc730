"""Does the QDense int8 path pay an HBM round-trip for dequantized weights?

The QDense int8 path (models/flux_transformer.py:162-172) computes
``x @ (q.astype(f32) * scale).astype(bf16)``.  If XLA materializes the
dequantized weights in HBM, every full-scale FLUX.1 eval pays an extra
~24 GB write+read on top of the 11.9 GB int8 read — worth a fused Pallas
kernel.  If XLA fuses the convert+scale into the dot's operand load, a
kernel is pointless (the wire-and-measure rule, benchmarks/results.md).

Measurement notes (tunneled v5e): timing repeated IDENTICAL dispatches
is invalid here — the backend memoizes (executable, args) and reports
physically impossible rates (>2 PF/s).  So each variant runs a lax.scan
over per-iteration inputs inside ONE jit, and the weight/scale carry a
fake dependence on the running output so the dequant cannot be hoisted
out of the loop (mirroring the real sampler, where dequant sits inside
the 20-step scan and provably is NOT hoisted — full-scale int8 fits).
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import importlib

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

im = importlib.import_module("ragb_vae_tpu.ops.pallas.int8_matmul")
from ragb_vae_tpu.utils.compilation_cache import enable_compilation_cache


def bench(step, xs, *consts, warmup: int = 1, reps: int = 3) -> float:
    """Median seconds per inner iteration of jit(scan(step)) over xs."""

    @jax.jit
    def run(xs, *consts):
        def body(carry, x):
            y = step(carry, x, *consts)
            # reduce the FULL output into the carry: consuming only a
            # slice lets XLA shrink the GEMM to a dot product (DCE)
            return carry * 0 + jnp.mean(y.astype(jnp.float32)), ()

        carry, _ = lax.scan(body, jnp.zeros((1, 1), jnp.float32), xs)
        return carry

    # bench.py:412 — block_until_ready is NOT trustworthy on the tunneled
    # backend; a host transfer of the scalar carry is the only real sync.
    for _ in range(warmup):
        float(np.asarray(run(xs, *consts))[0, 0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(run(xs, *consts))[0, 0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / xs.shape[0]


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()
    im.enable(True)  # single-chip probe: Pallas routing is safe here
    enable_compilation_cache(True)  # scan-program compiles take minutes on the tunnel

    # FLUX.1-scale GEMMs: inner_dim 3072, ff 12288; seq 1536 = 512² + text.
    shapes = [(1536, 3072, 12288), (1536, 12288, 3072), (4608, 3072, 12288)]
    rng = np.random.default_rng(0)
    for m, k, n in shapes:
        xs = jnp.asarray(
            rng.standard_normal((args.iters, m, k)), jnp.bfloat16
        )
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)
        q = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        s = jnp.asarray(rng.random((n,)) * 0.02, jnp.float32)

        def bf16_step(c, x, w):
            return x @ (w + c[0, 0].astype(w.dtype) * 0)

        def deq_step(c, x, q, s):
            # the shipped QDense pattern, un-hoistable via the carry
            wq = (q.astype(jnp.float32) * (s + c[0, 0] * 0)[None, :]).astype(
                jnp.bfloat16
            )
            return x @ wq

        def epi_step(c, x, q, s):
            # int8->bf16 convert on the operand; per-channel scale as epilogue
            y = x @ (q + (c[0, 0] * 0).astype(jnp.int8)).astype(jnp.bfloat16)
            return (y.astype(jnp.float32) * s[None, :]).astype(jnp.bfloat16)

        def pallas_step(c, x, q, s):
            # fused kernel: int8 tiles dequantized in-register, scale epilogue
            qq = q + (c[0, 0] * 0).astype(jnp.int8)
            return im.int8_matmul(x, qq, s)

        t_bf16 = bench(bf16_step, xs, w)
        t_deq = bench(deq_step, xs, q, s)
        t_epi = bench(epi_step, xs, q, s)
        t_pl = bench(pallas_step, xs, q, s)
        tf = 2 * m * k * n / 1e12
        print(
            f"[{m}x{k}x{n}] bf16 {t_bf16*1e3:7.3f} ms ({tf/t_bf16:6.1f} TF/s) | "
            f"dequant-into-dot {t_deq*1e3:7.3f} ms ({tf/t_deq:6.1f} TF/s) | "
            f"convert+scale-epilogue {t_epi*1e3:7.3f} ms ({tf/t_epi:6.1f} TF/s) | "
            f"pallas-fused {t_pl*1e3:7.3f} ms ({tf/t_pl:6.1f} TF/s)"
        )


if __name__ == "__main__":
    main()

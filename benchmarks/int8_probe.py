#!/usr/bin/env python
"""int8 MXU probe for the C=128 GEMM ceiling (VERDICT r2 item 9).

Two questions, answered separately:
1. RATE: do int8 GEMMs actually beat bf16 on v5e at the resnet-chain
   shapes (M = tile rows x width, K = 3C, N)? v5e MXU peak is ~394 TOPS
   int8 vs ~197 TFLOPS bf16 — 2x on paper.
2. NUMERICS: per-channel-weight + per-tensor-activation symmetric int8
   on the gn+silu+conv chain — output error vs the fp32 reference,
   compared against the bf16 path's error (the accuracy budget the model
   already tolerates).
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

ITERS = (200, 2200)  # two-point: (t2-t1)/(n2-n1) cancels the ~30 ms tunnel RPC


def timed(fn, *args, iters=ITERS):
    def run(n):
        from functools import partial

        @partial(jax.jit, static_argnums=0)
        def chain(n, *a):
            def body(i, carry):
                out = fn(carry, *a[1:])
                # scalar feedback keeps the loop sequential without
                # requiring fn's output shape to match the carry
                return carry + jnp.sum(out).astype(carry.dtype) * 1e-20

            return lax.fori_loop(0, n, body, a[0] * 1.0)

        float(jnp.sum(chain(n, *args).astype(jnp.float32)))
        t0 = time.perf_counter()
        float(jnp.sum(chain(n, *args).astype(jnp.float32)))
        return time.perf_counter() - t0

    n1, n2 = iters
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def rate_probe() -> None:
    rng = np.random.default_rng(0)
    print("== GEMM rate: bf16 vs int8 (M, K, N) ==")
    for m, k, n in [
        (16 * 1024, 384, 128),   # C=128 chain slab
        (16 * 1024, 768, 256),   # C=256
        (8 * 1024, 1536, 512),   # C=512
        (16 * 1024, 128, 128),   # winograd-style K=C
    ]:
        a8 = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
        a16 = a8.astype(jnp.bfloat16)
        b16 = b8.astype(jnp.bfloat16)

        def gemm_bf16(a, b):
            return lax.dot_general(
                a.astype(jnp.bfloat16), b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def gemm_int8(a, b):
            ai = a.astype(jnp.int8)
            return lax.dot_general(
                ai, b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)

        flops = 2 * m * k * n
        tb = timed(gemm_bf16, a16, b16)
        ti = timed(gemm_int8, a8.astype(jnp.float32), b8)  # carry is f32; cast in fn
        print(
            f"  M{m} K{k} N{n}: bf16 {tb*1e6:8.1f} us ({flops/tb/1e12:6.1f} TF/s) | "
            f"int8 {ti*1e6:8.1f} us ({flops/ti/1e12:6.1f} TOP/s) | ratio {tb/ti:4.2f}x"
        )


def numerics_probe() -> None:
    import ragb_vae_tpu.ops.pallas.resnet_block as rb

    rng = np.random.default_rng(1)
    print("== chain numerics: bf16 vs int8-quantized conv (vs fp32 ref) ==")
    bsz, h, w, c, n = 1, 64, 256, 128, 128
    x = rng.standard_normal((bsz, h, w, c)).astype(np.float32)
    a = (rng.standard_normal((bsz, c)) * 0.3 + 1.0).astype(np.float32)
    b = (rng.standard_normal((bsz, c)) * 0.1).astype(np.float32)
    wk = (rng.standard_normal((3, 3, c, n)) * 0.05).astype(np.float32)
    bias = (rng.standard_normal(n) * 0.1).astype(np.float32)

    y_ref, _ = jax.jit(rb._xla_chain)(x, a, b, wk, bias, None)
    y_ref = np.asarray(y_ref, np.float32)

    y_bf16, _ = jax.jit(rb._xla_chain)(
        jnp.asarray(x, jnp.bfloat16), a, b, wk, bias, None
    )
    y_bf16 = np.asarray(y_bf16, np.float32)

    # int8: quantize the ACTIVATED input (post gn+silu) per-tensor and the
    # weights per-output-channel; conv in int8, dequantize
    t = x * a[:, None, None, :] + b[:, None, None, :]
    act = t * (1.0 / (1.0 + np.exp(-t)))
    s_act = np.abs(act).max() / 127.0
    q_act = np.clip(np.round(act / s_act), -127, 127).astype(np.int8)
    s_w = np.abs(wk).max(axis=(0, 1, 2)) / 127.0  # per-N
    q_w = np.clip(np.round(wk / s_w), -127, 127).astype(np.int8)

    def int8_conv(qa, qw):
        y = lax.conv_general_dilated(
            qa.astype(jnp.int8), qw.astype(jnp.int8), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return y

    y_i8 = np.asarray(jax.jit(int8_conv)(q_act, q_w), np.float32)
    y_i8 = y_i8 * (s_act * s_w)[None, None, None, :] + bias[None, None, None, :]

    def err(yy):
        return float(np.abs(yy - y_ref).max()), float(
            np.sqrt(((yy - y_ref) ** 2).mean()) / (y_ref.std() + 1e-9)
        )

    for name, yy in (("bf16", y_bf16), ("int8", y_i8)):
        mx, rel = err(yy)
        print(f"  {name}: maxerr {mx:.5f} rel-rmse {rel:.5f} (ref scale {np.abs(y_ref).max():.2f})")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    rate_probe()
    numerics_probe()

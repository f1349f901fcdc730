"""Weight-only-int8 matmul: y = (x @ q) * scale (+ bias).

The QDense int8 path (models/flux_transformer.py:162) is the memory-
capacity play that fits full-scale FLUX.1 (11.9 B params) on one 16 GB
chip for serving (reference keeps bf16 and needs A100-80GB,
/root/reference/src/models/flux_kontext_textalpha.py:22-53).

MEASURED VERDICT (benchmarks/int8_dequant_probe.py, tunneled v5e,
FLUX-shape GEMMs — see results.md "int8 dequant, round 4"):

- the original QDense pattern ``x @ (q.astype(f32)*s).astype(bf16)``
  (per-channel scale INSIDE the dot operand) does NOT fuse: XLA
  materializes the dequantized weights, +10.5% over resident bf16;
- factoring the scale OUT of the dot — ``(x @ q.astype(bf16)) * s`` —
  DOES fuse the s8->bf16 convert into the dot's operand load, and at
  4.17 vs 4.35 ms even BEATS resident-bf16 (half the weight HBM bytes).
  This `_xla_epilogue` is the default path this module routes to;
- the Pallas kernel below (int8 tiles converted in-register, f32
  accumulator scratch, fused scale+bias epilogue) LOSES to that fused
  XLA dot by ~8% (best tiling 4.50 ms across bm 512/1536, bn 256/512,
  bk 128/256) — one more entry in results.md's "isolated kernels lose
  to XLA fusion" ledger. It stays available behind `enable()` for
  backends where the convert does not fuse, and as the measured-refuted
  baseline. Compile-time trap: Mosaic's s8->bf16 relayout is unrolled
  superlinearly in tile size (q tiles of 128x256 compile in seconds;
  512x1024 takes tens of minutes), hence the small block candidates.

int8 magnitudes (<=127) are exact in bf16, so the dot sees exact weights
either way; the only rounding is the output's. Gradients (QLoRA trains
THROUGH frozen int8 base layers) use the exact XLA fallback's transpose
rules, same policy as the resnet-block kernels.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

INTERPRET = False  # flipped by CPU tests

# Pallas routing is opt-in per process: under GSPMD-partitioned jits
# (tp/dp serving meshes) an opaque custom call would make the partitioner
# replicate its operands, so only known single-chip paths enable it.
_ENABLED = False


def enable(on: bool = True) -> None:
    global _ENABLED
    _ENABLED = on


def _pick_block(dim: int, candidates) -> Optional[int]:
    for c in candidates:
        if dim % c == 0:
            return c
    return None


def _kernel(x_ref, q_ref, s_ref, b_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...],
        q_ref[...].astype(x_ref.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == nk - 1)
    def _epilogue():
        o_ref[...] = (acc_ref[...] * s_ref[0, :][None, :] + b_ref[0, :][None, :]).astype(
            o_ref.dtype
        )


def _int8_matmul_impl(
    x: Array, q: Array, scale: Array, bias: Array, bm: int, bn: int, bk: int
) -> Array:
    m, k = x.shape
    n = q.shape[1]
    nk = k // bk
    grid = (m // bm, n // bn, nk)
    vmem = (
        2 * (bm * bk * x.dtype.itemsize + bk * bn)  # double-buffered x/q tiles
        + bm * bn * 4  # f32 accumulator
        + 2 * bm * bn * x.dtype.itemsize  # double-buffered out tile
        + 2 * 2 * bn * 4  # scale/bias blocks
        + (4 << 20)  # stack/overhead headroom (measured: 1 MiB undershoots)
    )
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * x.dtype.itemsize * (n // bn)
            + k * n
            + m * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem), 120 * (1 << 20))
        ),
        interpret=INTERPRET,
    )(x, q, scale[None, :].astype(jnp.float32), bias[None, :].astype(jnp.float32))


def _xla_epilogue(x: Array, q: Array, scale: Array, bias: Array) -> Array:
    """Exact reference: scale/bias OUT of the dot (same numerics as pallas)."""
    y = jax.lax.dot_general(
        x,
        q.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y * scale + bias).astype(x.dtype)


def _xla_dequant(x: Array, q: Array, scale: Array, bias: Array) -> Array:
    """The OLD dequantize-into-dot form (rounds every weight to x.dtype;
    XLA materializes the dequantized tree — measured +10.5% on the ff GEMM).
    Kept ONLY for same-session A/B benchmarking via RAGB_INT8_FORM=dequant
    (benchmarks/results.md round-5 epilogue re-measure ruling)."""
    w = (q.astype(jnp.float32) * scale).astype(x.dtype)
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (y + bias).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _int8_matmul(x, q, scale, bias, bm, bn, bk):
    return _int8_matmul_impl(x, q, scale, bias, bm, bn, bk)


def _fwd(x, q, scale, bias, bm, bn, bk):
    return _int8_matmul_impl(x, q, scale, bias, bm, bn, bk), (x, q, scale, bias)


def _bwd(bm, bn, bk, residuals, g):
    x, q, scale, bias = residuals
    _, vjp = jax.vjp(_xla_epilogue, x, q, scale, bias)
    return vjp(g)


_int8_matmul.defvjp(_fwd, _bwd)


def int8_matmul(
    x: Array, q: Array, scale: Array, bias: Optional[Array] = None
) -> Array:
    """x (..., K) @ q (K, N) int8, per-output-channel f32 `scale` (N,),
    optional f32 `bias` (N,) -> (..., N) in x.dtype.

    Routes to the fused Pallas kernel on TPU when enabled (see `enable`)
    and shapes tile; exact XLA fallback otherwise — both compute
    (x @ q) * scale + bias with f32 accumulation and ONE output rounding.
    """
    n = q.shape[1]
    b = bias if bias is not None else jnp.zeros((n,), jnp.float32)
    lead = x.shape[:-1]
    k = x.shape[-1]
    m = 1
    for d in lead:
        m *= d
    on_tpu = False
    try:
        on_tpu = jax.default_backend() == "tpu" or INTERPRET
    except Exception:
        pass
    import os

    if os.environ.get("RAGB_INT8_FORM") == "dequant":  # A/B bench knob only
        return _xla_dequant(x, q, scale, b)
    bm = _pick_block(m, (512, 256, 128))
    bn = _pick_block(n, (1024, 512, 256))
    bk = _pick_block(k, (512, 256, 128))
    if not (_ENABLED and on_tpu and bm and bn and bk):
        return _xla_epilogue(x, q, scale, b)
    y = _int8_matmul(x.reshape(m, k), q, scale, b, bm, bn, bk)
    return y.reshape(*lead, n)

"""Fused GroupNorm-apply + SiLU + 3x3 conv Pallas kernel (NHWC, stride 1).

The VAE's hot path is GroupNorm -> SiLU -> Conv3x3 chains, and at XLA's
conv rate those chains account for ~100% of the 1024^2 forward
(benchmarks/results.md). This kernel subsumes the producer chain into an
implicit-GEMM conv so the normalized/activated tensor never exists in
HBM, and needs NO pre-pad pass:

- grid over row slabs (H / tile_h), each step covering the FULL width;
- the halo is assembled with three DMAs into a persistent VMEM scratch
  of shape (tile_h+2, W+16, C): body rows into [1:tile_h+1, 8:W+8)
  (column offset 8 keeps every DMA destination sublane-aligned),
  conditional one-row top/bottom halo DMAs, and border columns/rows
  zeroed once (scratch persists across sequential grid steps, so the
  zero borders never need rewriting);
- producer fusion in VMEM: t = silu(x*a + b) on the slab;
- nine accumulated MXU GEMMs with fp32 accumulation, conv bias in the
  epilogue.

`a`/`b` are the folded GroupNorm coefficients (scale*rstd, bias-mean*a)
from the fp32 stats reduction, computed outside (that reduction is one
unavoidable read of x either way).

Gradients via custom VJP over the equivalent XLA ops (recompute).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

INTERPRET = False

DEFAULT_TILE_H = 4
# VMEM budget: scratch (tile_h+2)(W+8)C*2 + acc tile_h*W*N*4 + weights 9CN*2
MAX_VMEM_BYTES = 12 * 1024 * 1024


def _kernel(x_hbm, a_ref, b_ref, w_ref, bias_ref, out_ref, scratch, t_buf, sems, *, tile_h, height, width):
    hi = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    h0 = hi * tile_h

    # persistent zero borders: t_buf is zeroed once; every later write stays
    # inside columns [8, 8+width), so border columns remain zero forever.
    @pl.when(hi == 0)
    def _init():
        t_buf[:] = jnp.zeros_like(t_buf)

    body = pltpu.make_async_copy(
        x_hbm.at[pl.ds(h0, tile_h), :, :],
        scratch.at[pl.ds(1, tile_h), pl.ds(8, width), :],
        sems.at[0],
    )
    body.start()

    @pl.when(hi > 0)
    def _top():
        top = pltpu.make_async_copy(
            x_hbm.at[pl.ds(h0 - 1, 1), :, :],
            scratch.at[pl.ds(0, 1), pl.ds(8, width), :],
            sems.at[1],
        )
        top.start()
        top.wait()

    @pl.when(hi < n_tiles - 1)
    def _bottom():
        bottom = pltpu.make_async_copy(
            x_hbm.at[pl.ds(h0 + tile_h, 1), :, :],
            scratch.at[pl.ds(tile_h + 1, 1), pl.ds(8, width), :],
            sems.at[2],
        )
        bottom.start()
        bottom.wait()

    body.wait()

    c_in = scratch.shape[-1]
    n_out = out_ref.shape[-1]

    # fused producer: t = silu(x*a + b) on the data region, written into
    # t_buf (borders stay zero = SAME padding); invalid halo rows on the
    # global edges are re-zeroed explicitly.
    raw = scratch[:, pl.ds(8, width), :].astype(jnp.float32)
    act = raw * a_ref[:] + b_ref[:]
    act = act * jax.nn.sigmoid(act)
    t_buf[:, pl.ds(8, width), :] = act.astype(t_buf.dtype)

    @pl.when(hi == 0)
    def _zero_top():
        t_buf[0, :, :] = jnp.zeros_like(t_buf[0])

    @pl.when(hi == n_tiles - 1)
    def _zero_bottom():
        t_buf[tile_h + 1, :, :] = jnp.zeros_like(t_buf[tile_h + 1])

    acc = jnp.zeros((tile_h * width, n_out), jnp.float32)
    for u in range(3):
        for v in range(3):
            window = t_buf[u : u + tile_h, 7 + v : 7 + v + width, :].reshape(
                tile_h * width, c_in
            )
            acc = acc + jax.lax.dot_general(
                window,
                w_ref[u, v],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[:, :, :] = (acc + bias_ref[:]).reshape(tile_h, width, n_out).astype(out_ref.dtype)


def _fused_fwd_impl(x, a, b, w, bias, tile_h):
    height, width, c_in = x.shape
    n_out = w.shape[-1]
    return pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, height=height, width=width),
        grid=(height // tile_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c_in, n_out), lambda hi: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_h, width, n_out), lambda hi: (hi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((height, width, n_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, width + 16, c_in), x.dtype),
            pltpu.VMEM((tile_h + 2, width + 16, c_in), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * height * width * c_in * n_out,
            bytes_accessed=(x.size + w.size + height * width * n_out) * 2,
            transcendentals=height * width * c_in,
        ),
        interpret=INTERPRET,
    )(x, a, b, w, bias)


def _xla_ref(x, a, b, w, bias):
    t = x.astype(jnp.float32) * a + b
    t = (t * jax.nn.sigmoid(t)).astype(x.dtype)
    out = lax.conv_general_dilated(
        t[None], w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[0]
    return out + bias.astype(out.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused(x, a, b, w, bias, tile_h):
    return _fused_fwd_impl(x, a, b, w, bias, tile_h)


def _fwd(x, a, b, w, bias, tile_h):
    return _fused_fwd_impl(x, a, b, w, bias, tile_h), (x, a, b, w, bias)


def _bwd(tile_h, residuals, g):
    x, a, b, w, bias = residuals
    _, vjp = jax.vjp(_xla_ref, x, a, b, w, bias)
    return vjp(g)


_fused.defvjp(_fwd, _bwd)


def group_norm_coeffs(x: Array, scale: Array, bias: Array, num_groups: int, eps: float = 1e-6):
    """Fold GroupNorm stats into per-(batch, channel) (a, b) fp32 coeffs:
    gn(x) = x*a + b. One fp32-accumulated read of x (unavoidable)."""
    bsz = x.shape[0]
    c = x.shape[-1]
    grouped = x.reshape(bsz, -1, num_groups, c // num_groups)
    mean = jnp.mean(grouped, axis=(1, 3), dtype=jnp.float32)
    meansq = jnp.mean(jnp.square(grouped.astype(jnp.float32)), axis=(1, 3), dtype=jnp.float32)
    rstd = jax.lax.rsqrt(meansq - jnp.square(mean) + eps)
    rstd_c = jnp.repeat(rstd, c // num_groups, axis=1)
    mean_c = jnp.repeat(mean, c // num_groups, axis=1)
    a = scale[None, :].astype(jnp.float32) * rstd_c
    b = bias[None, :].astype(jnp.float32) - mean_c * a
    return a, b


def fused_gn_silu_conv3x3_batched(
    x: Array, a: Array, b: Array, w: Array, bias: Array, **kwargs
) -> Array:
    """(B, H, W, C) wrapper with per-sample (B, C) coefficients."""
    if x.shape[0] == 1:
        return fused_gn_silu_conv3x3(x[0], a[0], b[0], w, bias, **kwargs)[None]
    return jax.vmap(
        lambda xi, ai, bi: fused_gn_silu_conv3x3(xi, ai, bi, w, bias, **kwargs)
    )(x, a, b)


def fused_gn_silu_conv3x3(
    x: Array,
    a: Array,
    b: Array,
    w: Array,
    bias: Array,
    *,
    tile_h: int = DEFAULT_TILE_H,
    force_xla: bool = False,
) -> Array:
    """silu(x*a + b) -> conv3x3 SAME -> + bias. x (H, W, C)."""
    height, width, c_in = x.shape
    n_out = w.shape[-1]
    on_tpu = False
    try:
        on_tpu = jax.default_backend() == "tpu" or INTERPRET
    except Exception:
        pass
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    vmem = (
        2 * (tile_h + 2) * (width + 16) * c_in * itemsize  # scratch + t_buf
        + tile_h * width * c_in * 4                        # act transient
        + tile_h * width * n_out * 4                       # fp32 accumulator
        + 9 * c_in * n_out * itemsize
        + 2 * tile_h * width * n_out * itemsize            # double-buffered out
    )
    aligned = (
        height % tile_h == 0
        and width % 8 == 0
        and c_in % 128 == 0
        and n_out % 128 == 0
        and height >= tile_h
        and vmem <= MAX_VMEM_BYTES
    )
    if force_xla or not on_tpu or not aligned:
        return _xla_ref(x, a, b, w, bias)
    return _fused(x, a, b, w, bias, tile_h)

"""3x3 stride-1 SAME convolution as a Pallas implicit-GEMM kernel (NHWC).

Targets the VAE's hot conv shapes (C_in = C_out in {128, 256, 512},
1024^2 -> 128^2 feature maps, batch 1 — the v5e fast path). XLA's conv
emitter measures ~44-58 TF/s on these shapes while plain GEMMs reach
~132 TF/s (benchmarks/results.md); this kernel restates the conv as nine
accumulated MXU GEMMs per output tile:

- the input is zero-padded by 1 ONCE outside the kernel (one cheap
  elementwise pass) so every halo window is a static (TH+2, TW+2, C)
  slice — overlapping windows cannot be expressed as BlockSpecs, whose
  index maps are block-granular, so the padded input stays in HBM
  (`memory_space=ANY`) and each grid step DMAs its window into VMEM;
- the full (3, 3, C, N) weight block is VMEM-resident across all grid
  steps (constant index_map);
- fp32 accumulation in VMEM, one (TH, TW, N) output tile per step.

Gradients run through a custom VJP using XLA's transpose rules (forward
speed is what the serving path needs; training keeps XLA numerics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

INTERPRET = False  # flipped by CPU tests

DEFAULT_TILE_H = 16
DEFAULT_TILE_W = 128


def _conv_kernel(x_hbm, w_ref, out_ref, scratch, sem, *, tile_h, tile_w):
    """One (tile_h, tile_w) output tile; grid = (H/tile_h, W/tile_w).

    `x_hbm` is the PADDED input (H+2, W+2, C); output row h0+r, col w0+s
    uses padded rows [h0+r, h0+r+3) — the window starting at (h0, w0).
    """
    hi = pl.program_id(0)
    wi = pl.program_id(1)
    # HBM slices must be 8-sublane aligned on the W dim: copy tile_w + 8
    # (the input is right-padded accordingly); the 3 column windows read
    # offsets 0..2 inside the scratch.
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(hi * tile_h, tile_h + 2), pl.ds(wi * tile_w, tile_w + 8), :],
        scratch.at[:, :, :],
        sem,
    )
    dma.start()
    dma.wait()

    c_in = scratch.shape[-1]
    n_out = out_ref.shape[-1]
    acc = jnp.zeros((tile_h * tile_w, n_out), jnp.float32)
    for u in range(3):
        for v in range(3):
            window = scratch[u : u + tile_h, v : v + tile_w, :].reshape(
                tile_h * tile_w, c_in
            )
            acc = acc + jax.lax.dot_general(
                window,
                w_ref[u, v],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[:, :, :] = acc.reshape(tile_h, tile_w, n_out).astype(out_ref.dtype)


def _conv3x3_same_fwd_impl(x: Array, w: Array, tile_h: int, tile_w: int) -> Array:
    height, width, c_in = x.shape
    n_out = w.shape[-1]
    xp = jnp.pad(x, ((1, 1), (1, 7), (0, 0)))  # right-pad W to an 8-aligned halo window
    return pl.pallas_call(
        functools.partial(_conv_kernel, tile_h=tile_h, tile_w=tile_w),
        grid=(height // tile_h, width // tile_w),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded x in HBM; manual DMA
            pl.BlockSpec(
                (3, 3, c_in, n_out), lambda hi, wi: (0, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_h, tile_w, n_out), lambda hi, wi: (hi, wi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((height, width, n_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, tile_w + 8, c_in), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * height * width * c_in * n_out,
            bytes_accessed=(x.size + w.size + height * width * n_out) * 2,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(xp, w)


def _xla_conv(x: Array, w: Array) -> Array:
    return lax.conv_general_dilated(
        x[None], w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv3x3_same(x: Array, w: Array, tile_h: int, tile_w: int) -> Array:
    return _conv3x3_same_fwd_impl(x, w, tile_h, tile_w)


def _fwd(x, w, tile_h, tile_w):
    return _conv3x3_same_fwd_impl(x, w, tile_h, tile_w), (x, w)


def _bwd(tile_h, tile_w, residuals, g):
    x, w = residuals
    _, vjp = jax.vjp(lambda x_, w_: _xla_conv(x_, w_), x, w)
    return vjp(g)


_conv3x3_same.defvjp(_fwd, _bwd)


def conv3x3_same(
    x: Array,
    w: Array,
    *,
    tile_h: int = DEFAULT_TILE_H,
    tile_w: int = DEFAULT_TILE_W,
    force_xla: bool = False,
) -> Array:
    """x (H, W, C), w (3, 3, C, N) -> (H, W, N); SAME padding, stride 1.

    Falls back to lax.conv when shapes don't tile or off-TPU.
    """
    height, width, c_in = x.shape
    on_tpu = False
    try:
        on_tpu = jax.default_backend() == "tpu" or INTERPRET
    except Exception:
        pass
    aligned = (
        height % tile_h == 0
        and width % tile_w == 0
        and c_in % 128 == 0
        and w.shape[-1] % 128 == 0
    )
    if force_xla or not on_tpu or not aligned:
        return _xla_conv(x, w)
    return _conv3x3_same(x, w, tile_h, tile_w)


def conv3x3_same_batched(x: Array, w: Array, **kwargs) -> Array:
    """(B, H, W, C) wrapper; batch handled by vmap (grid-major on TPU)."""
    if x.ndim == 3:
        return conv3x3_same(x, w, **kwargs)
    if x.shape[0] == 1:
        return conv3x3_same(x[0], w, **kwargs)[None]
    return jax.vmap(lambda s: conv3x3_same(s, w, **kwargs))(x)

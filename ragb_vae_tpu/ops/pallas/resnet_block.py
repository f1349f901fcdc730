"""Whole-resnet-block Pallas kernels: GN-apply + SiLU + conv3x3 with a
fused stats / skip-add epilogue (NHWC, stride 1, batched grid).

Round-1 finding (benchmarks/results.md): the per-chain fused
GN+SiLU+conv kernel wins in isolation (+10-14%) but loses end-to-end
because the SEPARATE GroupNorm-stats passes and the broken residual
epilogue fusions each cost a full HBM pass per block. This module closes
the block: a ResnetBlock (reference runs it inside diffusers,
/root/reference/src/models/rgba_vae.py:277-279) becomes TWO kernel
launches with nothing in between but (B, C)-sized coefficient math:

  kernel 1: y1    = conv1(silu(gn1(x)))            + stats(y1) epilogue
  kernel 2: out   = conv2(silu(gn2(y1))) + skip(x) + stats(out) epilogue

The stats epilogue accumulates per-channel (sum, sum of squares) of the
kernel's OWN output while it is still on-chip, so the next GroupNorm's
statistics cost zero extra HBM traffic. Chained across the blocks of a
level, per-block HBM traffic drops from ~9 passes (XLA's fused pipeline)
to ~5. The batch dimension is a leading grid axis — no `lax.map`
slicing, which also sidesteps XLA's batch>=2 block-composition
regression (benchmarks/block_cliff.py: an XLA ResnetBlock is 1.5x slower
per image at batch 2 than batch 1; individual ops are not).

Kernel structure (per grid step = one row-slab of one sample):
- ONE contiguous double-buffered DMA brings rows [h0-1, h0+tile_h+1) of
  x into VMEM; the next step's slab is prefetched while this one
  computes (benchmarks/batch_cliff.py measured a single XLA conv leaving
  ~45% of the chip idle — pipelining is where the headroom is).
- the activated slab A = silu(x*a + b) is computed ONCE (VPU), then
  three column-shifted copies assemble an implicit-im2col patch buffer
  P[r, w, v*C:(v+1)*C] = A[r, w+v-1] — 3 staging copies instead of the 9
  strided window reads of the naive 9-tap formulation, and the three
  row-spans P[u:u+tile_h] are contiguous views (no copy) feeding three
  MXU GEMMs with contraction depth 3C (benchmarks/conv_formulations.py:
  back-to-back K=C GEMMs reach 105-178 TF/s on v5e — the MXU is not the
  bottleneck, staging is).
- epilogue: + bias [+ skip], cast, store, and fp32 per-channel
  (sum, sumsq) accumulation into a scratch that persists across the
  row-slabs of a sample (grid revisits the same stats block).

VMEM: v5e has ~128 MiB; the default 16 MiB scoped limit is raised via
CompilerParams to fit larger tiles (tile_h auto-picked per shape).

Numerics: GN statistics accumulate in fp32 from the bf16-cast output
(matching the unfused path, which reads the bf16 tensor back); the conv
accumulates in fp32 on the MXU.

Gradients: custom VJP over an equivalent XLA composition (recompute) —
the forward kernel also serves the remat replay in training.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

INTERPRET = False

MAX_VMEM_BYTES = 100 * 1024 * 1024  # v5e VMEM ~128 MiB; leave headroom


def _kernel(
    x_hbm,
    a_ref,
    b_ref,
    w_ref,
    bias_ref,
    skip_ref,
    ws_ref,
    wsb_ref,
    out_ref,
    stats_ref,
    xbuf,
    awide,
    pbuf,
    acc_ref,
    sems,
    *,
    tile_h: int,
    width: int,
    n_tiles: int,
    has_skip: bool,
    has_proj: bool,
    activation: str,
):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    n_b = pl.num_programs(0)
    slot = (bi * n_tiles + hi) % 2

    def slab_dma(b_idx, h_idx, into_slot):
        """DMA descriptors for rows [h0-1, h0+tile_h+1) clamped to the
        image, landing so that xbuf row r holds image row h0-1+r.
        Branches are emitted statically (n_tiles is trace-time) and
        selected dynamically; start/wait must use identical descriptors
        (DMA semaphores complete by byte count)."""
        if n_tiles == 1:
            yield None, pltpu.make_async_copy(
                x_hbm.at[b_idx, pl.ds(0, tile_h), :, :],
                xbuf.at[into_slot, pl.ds(1, tile_h), pl.ds(8, width), :],
                sems.at[into_slot],
            )
            return
        h0 = h_idx * tile_h
        if n_tiles > 2:
            yield (
                jnp.logical_and(h_idx > 0, h_idx < n_tiles - 1),
                pltpu.make_async_copy(
                    x_hbm.at[b_idx, pl.ds(h0 - 1, tile_h + 2), :, :],
                    xbuf.at[into_slot, pl.ds(0, tile_h + 2), pl.ds(8, width), :],
                    sems.at[into_slot],
                ),
            )
        yield h_idx == 0, pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(0, tile_h + 1), :, :],
            xbuf.at[into_slot, pl.ds(1, tile_h + 1), pl.ds(8, width), :],
            sems.at[into_slot],
        )
        yield h_idx == n_tiles - 1, pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(h0 - 1, tile_h + 1), :, :],
            xbuf.at[into_slot, pl.ds(0, tile_h + 1), pl.ds(8, width), :],
            sems.at[into_slot],
        )

    def start_slab(b_idx, h_idx, into_slot):
        for cond, dma in slab_dma(b_idx, h_idx, into_slot):
            if cond is None:
                dma.start()
            else:
                pl.when(cond)(dma.start)

    def wait_slab(b_idx, h_idx, into_slot):
        for cond, dma in slab_dma(b_idx, h_idx, into_slot):
            if cond is None:
                dma.wait()
            else:
                pl.when(cond)(dma.wait)

    # warm-up: the very first step loads its own slab
    @pl.when(jnp.logical_and(bi == 0, hi == 0))
    def _warm():
        start_slab(bi, hi, slot)

    # prefetch the next step's slab into the other buffer
    nxt = bi * n_tiles + hi + 1

    @pl.when(nxt < n_b * n_tiles)
    def _prefetch():
        start_slab(nxt // n_tiles, nxt % n_tiles, (slot + 1) % 2)

    # wait for this step's slab
    wait_slab(bi, hi, slot)

    c_in = xbuf.shape[-1]
    n_out = out_ref.shape[-1]

    # A = act(x*a + b) over the whole slab (margins become garbage-of-
    # garbage; the two margin columns the shifts read are zeroed below).
    raw = xbuf[slot].astype(jnp.float32)
    act = raw * a_ref[0, 0][None, None, :] + b_ref[0, 0][None, None, :]
    if activation == "silu":
        act = act * jax.nn.sigmoid(act)
    awide[:] = act.astype(awide.dtype)
    awide[:, 7, :] = jnp.zeros_like(awide[:, 7, :])
    awide[:, 8 + width, :] = jnp.zeros_like(awide[:, 8 + width, :])

    # halo rows outside the image contribute zero (SAME padding is in
    # t-space: pad AFTER norm+silu)
    @pl.when(hi == 0)
    def _zero_top():
        awide[0] = jnp.zeros_like(awide[0])

    @pl.when(hi == n_tiles - 1)
    def _zero_bottom():
        awide[tile_h + 1] = jnp.zeros_like(awide[tile_h + 1])

    # implicit im2col along the column axis only: three shifted copies
    for v in range(3):
        pbuf[:, :, v * c_in : (v + 1) * c_in] = awide[:, 7 + v : 7 + v + width, :]

    # three MXU GEMMs, contraction depth 3C; row-spans are contiguous views
    acc = jnp.zeros((tile_h * width, n_out), jnp.float32)
    for u in range(3):
        acc = acc + jax.lax.dot_general(
            pbuf[u : u + tile_h].reshape(tile_h * width, 3 * c_in),
            w_ref[u],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y = acc + bias_ref[:][None, :]
    if has_skip and has_proj:
        # projected residual: skip_ref streams the ORIGINAL block input x
        # (c_skip channels) and the 1x1 conv_shortcut runs as a 4th GEMM
        # here — the separate XLA pass that wrote a full skip tensor to
        # HBM (and the kernel's read of it) collapses into one read of x.
        c_skip = skip_ref.shape[-1]
        y = y + jax.lax.dot_general(
            skip_ref[0].reshape(tile_h * width, c_skip),
            ws_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + wsb_ref[:][None, :]
    elif has_skip:
        y = y + skip_ref[0].reshape(tile_h * width, n_out).astype(jnp.float32)
    y_store = y.astype(out_ref.dtype)
    out_ref[0] = y_store.reshape(tile_h, width, n_out)

    # stats epilogue: per-channel sum / sumsq of the STORED (cast) value,
    # matching what a downstream GroupNorm would read back from HBM.
    yf = y_store.astype(jnp.float32)
    part = jnp.stack([jnp.sum(yf, axis=0), jnp.sum(jnp.square(yf), axis=0)])

    @pl.when(hi == 0)
    def _reset():
        acc_ref[:] = part

    @pl.when(hi > 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + part

    stats_ref[0] = acc_ref[:]


def _subpixel_kernel(
    x_hbm,
    w_ref,
    bias_ref,
    out_ref,
    stats_ref,
    xbuf,
    awide,
    pbuf,
    acc_ref,
    sems,
    *,
    tile_h: int,
    width: int,
    n_tiles: int,
):
    """Nearest-2x upsample + conv3x3 in SUBPIXEL form: each output parity
    (a, b) is a 2x2 conv on the SMALL grid with re-associated weights
    (taps landing in the same 2x2 source cell sum — exactly models/vae.py
    Upsample.fast, proven against the literal path), so the kernel reads
    the SMALL input and never materializes the 4x-upsampled tensor, at
    2.25x fewer MXU FLOPs than the literal conv3x3. These are the
    decoder's three most expensive convs (~25% of model FLOPs at 1024^2).

    The four parity outputs interleave for FREE: columns by declaring the
    output array (B, 2H, W, 2N) — bit-identical linear layout to the NHWC
    (B, 2H, 2W, N) the caller reshapes to — with the two column parities
    concatenated on the channel (lane) axis; rows by a leading-dim
    stack+reshape. The existing 3-column-shift patch buffer provides all
    four parities' 2x2 patches as CONTIGUOUS (row-span, channel-slice)
    views: parity rows a use spans [a, a+tile), [a+1, a+1+tile); parity
    cols b use channel slices [bC, (b+2)C). w_ref: (2, 2, 2, 2C, N)
    folded weights indexed [a, b, u'] (the fold differs per parity).
    """
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    n_b = pl.num_programs(0)
    slot = (bi * n_tiles + hi) % 2

    def slab_dma(b_idx, h_idx, into_slot):
        if n_tiles == 1:
            yield None, pltpu.make_async_copy(
                x_hbm.at[b_idx, pl.ds(0, tile_h), :, :],
                xbuf.at[into_slot, pl.ds(1, tile_h), pl.ds(8, width), :],
                sems.at[into_slot],
            )
            return
        h0 = h_idx * tile_h
        if n_tiles > 2:
            yield (
                jnp.logical_and(h_idx > 0, h_idx < n_tiles - 1),
                pltpu.make_async_copy(
                    x_hbm.at[b_idx, pl.ds(h0 - 1, tile_h + 2), :, :],
                    xbuf.at[into_slot, pl.ds(0, tile_h + 2), pl.ds(8, width), :],
                    sems.at[into_slot],
                ),
            )
        yield h_idx == 0, pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(0, tile_h + 1), :, :],
            xbuf.at[into_slot, pl.ds(1, tile_h + 1), pl.ds(8, width), :],
            sems.at[into_slot],
        )
        yield h_idx == n_tiles - 1, pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(h0 - 1, tile_h + 1), :, :],
            xbuf.at[into_slot, pl.ds(0, tile_h + 1), pl.ds(8, width), :],
            sems.at[into_slot],
        )

    def start_slab(b_idx, h_idx, into_slot):
        for cond, dma in slab_dma(b_idx, h_idx, into_slot):
            if cond is None:
                dma.start()
            else:
                pl.when(cond)(dma.start)

    def wait_slab(b_idx, h_idx, into_slot):
        for cond, dma in slab_dma(b_idx, h_idx, into_slot):
            if cond is None:
                dma.wait()
            else:
                pl.when(cond)(dma.wait)

    @pl.when(jnp.logical_and(bi == 0, hi == 0))
    def _warm():
        start_slab(bi, hi, slot)

    nxt = bi * n_tiles + hi + 1

    @pl.when(nxt < n_b * n_tiles)
    def _prefetch():
        start_slab(nxt // n_tiles, nxt % n_tiles, (slot + 1) % 2)

    wait_slab(bi, hi, slot)

    c_in = xbuf.shape[-1]
    n_out = w_ref.shape[-1]

    awide[:] = xbuf[slot]
    awide[:, 7, :] = jnp.zeros_like(awide[:, 7, :])
    awide[:, 8 + width, :] = jnp.zeros_like(awide[:, 8 + width, :])

    @pl.when(hi == 0)
    def _zero_top():
        awide[0] = jnp.zeros_like(awide[0])

    @pl.when(hi == n_tiles - 1)
    def _zero_bottom():
        awide[tile_h + 1] = jnp.zeros_like(awide[tile_h + 1])

    for v in range(3):
        pbuf[:, :, v * c_in : (v + 1) * c_in] = awide[:, 7 + v : 7 + v + width, :]

    rows = []
    for a in range(2):
        cols = []
        for b in range(2):
            acc = jnp.zeros((tile_h * width, n_out), jnp.float32)
            for u in range(2):
                patch = pbuf[a + u : a + u + tile_h, :, b * c_in : (b + 2) * c_in]
                acc = acc + jax.lax.dot_general(
                    patch.reshape(tile_h * width, 2 * c_in),
                    w_ref[a, b, u],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            cols.append(acc + bias_ref[:][None, :])
        # column parities concatenated on the lane axis == interleaved cols
        rows.append(
            jnp.concatenate(cols, axis=-1).reshape(tile_h, width, 2 * n_out)
        )
    # row parities interleave on the leading axis (free rearrange)
    y = jnp.stack(rows, axis=1).reshape(2 * tile_h, width, 2 * n_out)
    y_store = y.astype(out_ref.dtype)
    out_ref[0] = y_store

    # stats: true per-channel (sum, sumsq) over N = both column parities
    yf = y_store.astype(jnp.float32).reshape(2 * tile_h * width, 2, n_out)
    part = jnp.stack(
        [jnp.sum(yf, axis=(0, 1)), jnp.sum(jnp.square(yf), axis=(0, 1))]
    )

    @pl.when(hi == 0)
    def _reset():
        acc_ref[:] = part

    @pl.when(hi > 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + part

    stats_ref[0] = acc_ref[:]


def _wino_kernel(
    x_hbm,
    a_ref,
    b_ref,
    u_ref,
    bias_ref,
    skip_ref,
    ws_ref,
    wsb_ref,
    out_ref,
    stats_ref,
    xbuf,
    awide,
    vbuf,
    acc_ref,
    sems,
    *,
    tile_h: int,
    width2: int,
    n_tiles: int,
    has_skip: bool,
    has_proj: bool,
    activation: str,
):
    """GN-apply + SiLU + conv3x3 via in-VMEM Winograd F(2x2, 3x3).

    Same slab staging / epilogues as `_kernel`, but the conv runs in the
    Winograd domain ENTIRELY inside VMEM — the XLA-level probe
    (benchmarks/winograd_probe.py) showed the three ~1 GB 16-variant
    transform tensors round-tripping HBM cost 10x; here the transform
    tensors live as register/VMEM values between the VPU transform and
    the 16 MXU GEMMs, so the 2.25x MAC saving is actually cashed.

    Layout tricks that make the transforms free-ish:
    - input arrives pre-viewed as (B, H, W/2, 2C) — the NHWC pair-channel
      identity (cf. `_downsample_kernel`) turns stride-2 COLUMN access
      into channel-half slices: the 4 column taps j in {-1,0,1,2} of tile
      col 2c are (pair c-1)[C:], (pair c)[:C], (pair c)[C:], (pair c+1)[:C];
    - stride-2 ROW access is a leading-dim regroup (T+2 slab rows ->
      (T/2+1, 2)): the 4 row taps are contiguous even/odd leading slices;
    - the column transform (4 VPU adds) happens BEFORE the row transform,
      on (T+2)-row tensors, so it is not redone per row parity;
    - output row/col parities interleave exactly like `_subpixel_kernel`:
      col parities concat on the lane axis ((T/2, W/2, 2N) == (T/2, W, N)
      linear layout), row parities stack+reshape on the leading axis.

    u_ref: (2, 4, 3C, N) pre-transformed folded weights (see
    `_wino_weights`). 8 GEMMs of contraction depth 3C replace the direct
    path's 3 GEMMs of the same depth at (24/36) the MACs. (The 16-GEMM
    K=C variant with the full 2-stage output transform measured SLOWER —
    0.63-1.00x vs direct, benchmarks/wino_bench.py r3 — its fp32 M/Z
    traffic and casts outweighed the extra MAC saving.)
    """
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    n_b = pl.num_programs(0)
    slot = (bi * n_tiles + hi) % 2
    t2 = tile_h // 2

    def slab_dma(b_idx, h_idx, into_slot):
        if n_tiles == 1:
            yield None, pltpu.make_async_copy(
                x_hbm.at[b_idx, pl.ds(0, tile_h), :, :],
                xbuf.at[into_slot, pl.ds(1, tile_h), pl.ds(8, width2), :],
                sems.at[into_slot],
            )
            return
        h0 = h_idx * tile_h
        if n_tiles > 2:
            yield (
                jnp.logical_and(h_idx > 0, h_idx < n_tiles - 1),
                pltpu.make_async_copy(
                    x_hbm.at[b_idx, pl.ds(h0 - 1, tile_h + 2), :, :],
                    xbuf.at[into_slot, pl.ds(0, tile_h + 2), pl.ds(8, width2), :],
                    sems.at[into_slot],
                ),
            )
        yield h_idx == 0, pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(0, tile_h + 1), :, :],
            xbuf.at[into_slot, pl.ds(1, tile_h + 1), pl.ds(8, width2), :],
            sems.at[into_slot],
        )
        yield h_idx == n_tiles - 1, pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(h0 - 1, tile_h + 1), :, :],
            xbuf.at[into_slot, pl.ds(0, tile_h + 1), pl.ds(8, width2), :],
            sems.at[into_slot],
        )

    def start_slab(b_idx, h_idx, into_slot):
        for cond, dma in slab_dma(b_idx, h_idx, into_slot):
            if cond is None:
                dma.start()
            else:
                pl.when(cond)(dma.start)

    def wait_slab(b_idx, h_idx, into_slot):
        for cond, dma in slab_dma(b_idx, h_idx, into_slot):
            if cond is None:
                dma.wait()
            else:
                pl.when(cond)(dma.wait)

    @pl.when(jnp.logical_and(bi == 0, hi == 0))
    def _warm():
        start_slab(bi, hi, slot)

    nxt = bi * n_tiles + hi + 1

    @pl.when(nxt < n_b * n_tiles)
    def _prefetch():
        start_slab(nxt // n_tiles, nxt % n_tiles, (slot + 1) % 2)

    wait_slab(bi, hi, slot)

    c2 = xbuf.shape[-1]  # = 2C
    c = c2 // 2
    n_out = u_ref.shape[-1]

    raw = xbuf[slot].astype(jnp.float32)
    act = raw * a_ref[0, 0][None, None, :] + b_ref[0, 0][None, None, :]
    if activation == "silu":
        act = act * jax.nn.sigmoid(act)
    awide[:] = act.astype(awide.dtype)
    # margins: pair col 7 slot1 = img col -1; pair col 8+W2 slot0 = img col W
    awide[:, 7, :] = jnp.zeros_like(awide[:, 7, :])
    awide[:, 8 + width2, :] = jnp.zeros_like(awide[:, 8 + width2, :])

    @pl.when(hi == 0)
    def _zero_top():
        awide[0] = jnp.zeros_like(awide[0])

    @pl.when(hi == n_tiles - 1)
    def _zero_bottom():
        awide[tile_h + 1] = jnp.zeros_like(awide[tile_h + 1])

    if WINO_DEBUG_PHASE == "act":
        # timing bisect: stop after staging+activation
        junk = awide[1 : tile_h + 1, 8 : 8 + width2, :]
        out_ref[0] = junk.astype(out_ref.dtype)
        stats_ref[0] = acc_ref[:]
        return

    # column transform B^T (4 taps -> 4 variants), fp32, on the full slab
    d_m1 = awide[:, 7 : 7 + width2, c:].astype(jnp.float32)
    d_0 = awide[:, 8 : 8 + width2, :c].astype(jnp.float32)
    d_p1 = awide[:, 8 : 8 + width2, c:].astype(jnp.float32)
    d_p2 = awide[:, 9 : 9 + width2, :c].astype(jnp.float32)
    cv = (d_m1 - d_p1, d_0 + d_p1, d_p1 - d_0, d_0 - d_p2)

    if WINO_DEBUG_PHASE == "colT":
        junk = (cv[0] + cv[1] + cv[2] + cv[3])[1 : tile_h + 1]
        out_ref[0] = jnp.concatenate([junk, junk], axis=-1).astype(out_ref.dtype)
        stats_ref[0] = acc_ref[:]
        return

    # row transform staged into ONE overlap-sliced buffer: vbuf[nu] holds
    # [V0 | V1 | V2 | V3] on the channel axis; the two folded GEMMs per nu
    # read the overlapping K-slices [0:3C] (A^T row p=0 weights U0;U1;U2)
    # and [C:4C] (p=1 weights U1;-U2;-U3). Folding the output ROW transform
    # into K trades 16 K=C GEMMs + 24 fp32 combines for 8 K=3C GEMMs + 8 —
    # MACs go 4/9 -> 6/9 of direct, but the fp32 M/Z traffic halves and
    # K=3C matches the direct kernel's best-measured contraction depth.
    for nu in range(4):
        v = cv[nu].reshape(t2 + 1, 2, width2, c)
        ev, od = v[:, 0], v[:, 1]
        vbuf[nu, :, :, 0 * c : 1 * c] = (ev[0:t2] - ev[1 : t2 + 1]).astype(vbuf.dtype)
        vbuf[nu, :, :, 1 * c : 2 * c] = (od[0:t2] + ev[1 : t2 + 1]).astype(vbuf.dtype)
        vbuf[nu, :, :, 2 * c : 3 * c] = (ev[1 : t2 + 1] - od[0:t2]).astype(vbuf.dtype)
        vbuf[nu, :, :, 3 * c : 4 * c] = (od[0:t2] - od[1 : t2 + 1]).astype(vbuf.dtype)

    if WINO_DEBUG_PHASE == "rowT":
        junk = vbuf[0, :, :, : 2 * n_out].astype(jnp.float32)
        out_ref[0] = jnp.concatenate([junk, junk], axis=0).reshape(
            tile_h, width2, 2 * n_out
        ).astype(out_ref.dtype)
        stats_ref[0] = acc_ref[:]
        return

    # 8 folded GEMMs: Z[p, nu] = Vcat_p(nu) @ Ufold[p, nu]  (K = 3C)
    z = [
        [
            jax.lax.dot_general(
                vbuf[nu, :, :, p * c : (p + 3) * c].reshape(t2 * width2, 3 * c),
                u_ref[p, nu],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for nu in range(4)
        ]
        for p in range(2)
    ]
    rows = []
    if has_skip:
        sk = skip_ref[0].reshape(t2, 2, width2, skip_ref.shape[-1])
    for p in range(2):
        yq0 = z[p][0] + z[p][1] + z[p][2]
        yq1 = z[p][1] - z[p][2] - z[p][3]
        # col parities concat on the lane axis == interleaved columns
        yp = jnp.concatenate([yq0, yq1], axis=-1) + bias_ref[:][None, :]
        if has_skip and has_proj:
            # 1x1 conv_shortcut per column slot (pair-layout 1x1 = two GEMMs)
            proj = jnp.concatenate(
                [
                    jax.lax.dot_general(
                        sk[:, p, :, s * (sk.shape[-1] // 2) : (s + 1) * (sk.shape[-1] // 2)]
                        .reshape(t2 * width2, sk.shape[-1] // 2),
                        ws_ref[:],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for s in range(2)
                ],
                axis=-1,
            )
            yp = yp + proj + wsb_ref[:][None, :]
        elif has_skip:
            yp = yp + sk[:, p].reshape(t2 * width2, 2 * n_out).astype(jnp.float32)
        rows.append(yp.reshape(t2, width2, 2 * n_out))
    y = jnp.stack(rows, axis=1).reshape(tile_h, width2, 2 * n_out)
    y_store = y.astype(out_ref.dtype)
    out_ref[0] = y_store

    # stats: true per-channel (sum, sumsq) over N = both column parities
    yf = y_store.astype(jnp.float32).reshape(tile_h * width2, 2, n_out)
    part = jnp.stack(
        [jnp.sum(yf, axis=(0, 1)), jnp.sum(jnp.square(yf), axis=(0, 1))]
    )

    @pl.when(hi == 0)
    def _reset():
        acc_ref[:] = part

    @pl.when(hi > 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + part

    stats_ref[0] = acc_ref[:]


def _wino_weights(w: Array) -> Array:
    """(3, 3, C, N) -> (2, 4, 3C, N) folded Winograd weights.

    U = G w G^T per (C, N) slice (fp32 fold — G rows contain 1/2, exact in
    fp32; summing in bf16 costs extra output error like the subpixel fold
    did), then the output ROW transform A^T (rows (1,1,1,0) / (0,1,-1,-1))
    folds into the contraction: Ufold[0, nu] = [U0;U1;U2], Ufold[1, nu] =
    [U1;-U2;-U3] — consumed by the kernel's overlapping [0:3C]/[C:4C]
    V-buffer slices."""
    g = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    u = jnp.einsum("xu,yv,uvcn->xycn", g, g, w.astype(jnp.float32))  # (4,4,C,N)
    p0 = jnp.concatenate([u[0], u[1], u[2]], axis=1)    # (4, 3C, N)
    p1 = jnp.concatenate([u[1], -u[2], -u[3]], axis=1)  # (4, 3C, N)
    return jnp.stack([p0, p1], axis=0)  # (2, 4, 3C, N)


# transform temporaries (cv fp32, 16 V bf16, 16 fp32 M accumulators) are
# SSA values Mosaic stack-allocates; budget them explicitly with slack
WINO_TILE_BUDGET = 60 * 1024 * 1024

# timing-bisect knob (benchmarks/wino_phase_probe.py): None/"full", or cut
# the kernel at "act" / "colT" / "rowT" / "gemm" (junk outputs, same traffic)
WINO_DEBUG_PHASE = None


def _wino_vmem_bytes(tile_h, width2, c, n_out, itemsize, c_skip=None):
    t2 = tile_h // 2
    c_last = (2 * c_skip) if c_skip is not None else 2 * n_out
    return (
        2 * (tile_h + 2) * (width2 + 16) * 2 * c * itemsize  # xbuf x2
        + (tile_h + 2) * (width2 + 16) * 2 * c * itemsize    # awide
        + (tile_h + 2) * (width2 + 16) * 2 * c * 4           # act transient
        + 4 * (tile_h + 2) * width2 * c * 4                  # cv (fp32)
        + 4 * t2 * width2 * 4 * c * itemsize                 # vbuf scratch
        + 8 * t2 * width2 * n_out * 4                        # Z accumulators
        + 2 * t2 * width2 * 2 * n_out * 4                    # Y transients
        + 2 * 4 * 3 * c * n_out * itemsize                   # folded U weights
        + 2 * tile_h * width2 * 2 * n_out * itemsize         # out (2x buffered)
        + 2 * tile_h * width2 * c_last * itemsize            # skip (2x buffered)
        + (0 if c_skip is None else c_skip * n_out * itemsize)  # 1x1 proj weights
    )


def _wino_pick_tile(height, width2, c, n_out, itemsize, c_skip=None):
    for tile_h in (16, 8, 4, 2):
        if height % tile_h != 0:
            continue
        vmem = _wino_vmem_bytes(tile_h, width2, c, n_out, itemsize, c_skip)
        if vmem <= WINO_TILE_BUDGET:
            return tile_h, vmem
    return None, None


def _wino_fwd_impl(x, a, b, w, bias, skip, ws, wsb, tile_h, activation):
    bsz, height, width, c_in = x.shape
    n_out = w.shape[-1]
    w2 = width // 2
    has_skip = skip is not None
    has_proj = ws is not None
    c_skip = skip.shape[-1] if has_proj else None
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    vmem = _wino_vmem_bytes(tile_h, w2, c_in, n_out, itemsize, c_skip)

    x6 = x.reshape(bsz, height, w2, 2 * c_in)  # free pair-channel view
    u = _wino_weights(w).astype(x.dtype)
    a2 = jnp.concatenate([a, a], axis=-1)[:, None, :]  # (B, 1, 2C)
    b2 = jnp.concatenate([b, b], axis=-1)[:, None, :]
    bias2 = jnp.concatenate([bias, bias], axis=-1)  # (2N,) pair layout

    operands = [x6, a2, b2, u, bias2]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, 1, 2 * c_in), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2 * c_in), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (2, 4, 3 * c_in, n_out), lambda bi, hi: (0, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if has_skip:
        c_last = 2 * (c_skip if has_proj else n_out)
        operands.append(skip.reshape(bsz, height, w2, c_last))
        in_specs.append(
            pl.BlockSpec(
                (1, tile_h, w2, c_last),
                lambda bi, hi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    if has_proj:
        wsb2 = jnp.concatenate([wsb, wsb], axis=-1)
        operands.extend([ws, wsb2])
        in_specs.extend([
            pl.BlockSpec((c_skip, n_out), lambda bi, hi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ])
    kernel = functools.partial(
        _wino_kernel,
        tile_h=tile_h,
        width2=w2,
        n_tiles=height // tile_h,
        has_skip=has_skip,
        has_proj=has_proj,
        activation=activation,
    )
    kernel = functools.partial(
        _operand_adapter, kernel, has_skip=has_skip, has_proj=has_proj
    )
    y, stats = pl.pallas_call(
        kernel,
        grid=(bsz, height // tile_h),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, tile_h, w2, 2 * n_out),
                lambda bi, hi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 2, n_out), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # (B, H, W/2, 2N) == (B, H, W, N) NHWC linear layout (pair view)
            jax.ShapeDtypeStruct((bsz, height, w2, 2 * n_out), x.dtype),
            jax.ShapeDtypeStruct((bsz, 2, n_out), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, w2 + 16, 2 * c_in), x.dtype),
            pltpu.VMEM((tile_h + 2, w2 + 16, 2 * c_in), x.dtype),
            pltpu.VMEM((4, tile_h // 2, w2, 4 * c_in), x.dtype),
            pltpu.VMEM((2, n_out), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem * 1.5) + (2 << 20), 127 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * bsz * height * width * c_in * n_out,
            bytes_accessed=(x.size + 16 * c_in * n_out + bsz * height * width * n_out)
            * itemsize,
            transcendentals=bsz * height * width * c_in,
        ),
        interpret=INTERPRET,
    )(*operands)
    return y.reshape(bsz, height, width, n_out), stats


def _fold_subpixel_weights(w: Array) -> Array:
    """(3, 3, C, N) conv3x3 -> (2, 2, 2, 2C, N) subpixel kernels [a, b, u'].

    Same re-association as models/vae.py Upsample.fast (tested against
    the literal nearest+conv3x3 there): row parity a=0 folds rows
    (W0 | W1+W2), a=1 (W0+W1 | W2); column parity b=0 folds (V0 | V1+V2)
    over small cols (c'-1, c'), b=1 (V0+V1 | V2) over (c', c'+1) — the
    kernel's patch slice [bC:(b+2)C] supplies exactly those two columns.
    The two column taps flatten v-major into the K=2C contraction."""
    c_in, n_out = w.shape[2], w.shape[3]
    r = [
        jnp.stack([w[0], w[1] + w[2]], axis=0),          # a=0: rows r'-1, r'
        jnp.stack([w[0] + w[1], w[2]], axis=0),          # a=1: rows r', r'+1
    ]
    out = []
    for a in range(2):
        per_b = []
        for b in range(2):
            if b == 0:
                k = jnp.stack([r[a][:, 0], r[a][:, 1] + r[a][:, 2]], axis=1)
            else:
                k = jnp.stack([r[a][:, 0] + r[a][:, 1], r[a][:, 2]], axis=1)
            per_b.append(k.reshape(2, 2 * c_in, n_out))   # [u', v*C -> 2C, N]
        out.append(jnp.stack(per_b, axis=0))
    return jnp.stack(out, axis=0)  # (2, 2, 2, 2C, N)


def _pick_tile_h(height: int, width: int, c_in: int, n_out: int, itemsize: int, c_skip=None):
    """Largest tile_h whose VMEM footprint fits the budget."""
    for tile_h in (32, 16, 8, 4):
        if height % tile_h != 0:
            continue
        vmem = _vmem_bytes(tile_h, width, c_in, n_out, itemsize, c_skip)
        if vmem <= MAX_VMEM_BYTES:
            return tile_h, vmem
    return None, None


def _vmem_bytes(tile_h, width, c_in, n_out, itemsize, c_skip=None):
    return (
        2 * (tile_h + 2) * (width + 16) * c_in * itemsize  # xbuf x2
        + (tile_h + 2) * (width + 16) * c_in * itemsize    # awide
        + (tile_h + 2) * width * 3 * c_in * itemsize       # pbuf
        + (tile_h + 2) * width * c_in * 4                  # act transient
        + tile_h * width * n_out * 4                       # fp32 accumulator
        + 3 * 3 * c_in * n_out * itemsize                  # weights
        + 2 * tile_h * width * n_out * itemsize            # out (2x buffered)
        + 2 * tile_h * width * (c_skip or n_out) * itemsize  # skip (2x buffered)
        + (0 if c_skip is None else c_skip * n_out * itemsize)  # 1x1 proj weights
    )


def _chain_fwd_impl(x, a, b, w, bias, skip, ws, wsb, tile_h, activation):
    bsz, height, width, c_in = x.shape
    n_out = w.shape[-1]
    has_skip = skip is not None
    has_proj = ws is not None
    c_skip = skip.shape[-1] if has_proj else None
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    if tile_h is None:
        tile_h, vmem = _pick_tile_h(height, width, c_in, n_out, itemsize, c_skip)
    else:
        vmem = _vmem_bytes(tile_h, width, c_in, n_out, itemsize, c_skip)
    # (B, C) coefficients -> (B, 1, C): a (1, 1, C) block satisfies the
    # "last two dims = (8k, 128k) or whole-dim" Mosaic block rule.
    operands = [x, a[:, None, :], b[:, None, :], w.reshape(3, 3 * c_in, n_out), bias]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, 1, c_in), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c_in), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (3, 3 * c_in, n_out), lambda bi, hi: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if has_skip:
        operands.append(skip)
        in_specs.append(
            pl.BlockSpec(
                (1, tile_h, width, c_skip if has_proj else n_out),
                lambda bi, hi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    if has_proj:
        operands.extend([ws, wsb])
        in_specs.extend([
            pl.BlockSpec((c_skip, n_out), lambda bi, hi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ])
    kernel = functools.partial(
        _kernel,
        tile_h=tile_h,
        width=width,
        n_tiles=height // tile_h,
        has_skip=has_skip,
        has_proj=has_proj,
        activation=activation,
    )
    kernel = functools.partial(
        _operand_adapter, kernel, has_skip=has_skip, has_proj=has_proj
    )
    y, stats = pl.pallas_call(
        kernel,
        grid=(bsz, height // tile_h),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec(
                (1, tile_h, width, n_out),
                lambda bi, hi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 2, n_out), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, height, width, n_out), x.dtype),
            jax.ShapeDtypeStruct((bsz, 2, n_out), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, width + 16, c_in), x.dtype),
            pltpu.VMEM((tile_h + 2, width + 16, c_in), x.dtype),
            pltpu.VMEM((tile_h + 2, width, 3 * c_in), x.dtype),
            pltpu.VMEM((2, n_out), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem * 1.25) + (1 << 20), 128 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * bsz * height * width * c_in * n_out,
            bytes_accessed=(x.size + 9 * c_in * n_out + bsz * height * width * n_out)
            * itemsize,
            transcendentals=bsz * height * width * c_in,
        ),
        interpret=INTERPRET,
    )(*operands)
    return y, stats


def _operand_adapter(kernel, *args, has_skip: bool, has_proj: bool):
    """Map the variable pallas operand list onto _kernel's fixed signature."""
    n_lead = 5  # x, a, b, w, bias
    lead = args[:n_lead]
    rest = list(args[n_lead:])
    skip = rest.pop(0) if has_skip else None
    ws = rest.pop(0) if has_proj else None
    wsb = rest.pop(0) if has_proj else None
    kernel(*lead, skip, ws, wsb, *rest)


def _xla_chain(x, a, b, w, bias, skip, ws=None, wsb=None, activation="silu"):
    """Reference composition (also the VJP recompute path)."""
    w = w.astype(x.dtype)
    if ws is not None:
        ws = ws.astype(x.dtype)
    t = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    if activation == "silu":
        t = t * jax.nn.sigmoid(t)
    t = t.astype(x.dtype)
    # no preferred_element_type: its transpose rule mixes the f32
    # cotangent with bf16 weights and rejects (this fn IS the VJP
    # recompute path); TPU accumulates bf16 convs in f32 internally
    y = lax.conv_general_dilated(
        t, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)
    y = y + bias.astype(jnp.float32)[None, None, None, :]
    if skip is not None and ws is not None:
        proj = lax.dot_general(
            skip, ws, dimension_numbers=(((3,), (0,)), ((), ())),
        ).astype(jnp.float32)
        y = y + proj + wsb.astype(jnp.float32)[None, None, None, :]
    elif skip is not None:
        y = y + skip.astype(jnp.float32)
    y = y.astype(x.dtype)
    yf = y.astype(jnp.float32)
    stats = jnp.stack(
        [jnp.sum(yf, axis=(1, 2)), jnp.sum(jnp.square(yf), axis=(1, 2))], axis=1
    )
    return y, stats


def _bwd_kernel(
    x_hbm,
    g_hbm,
    y_hbm,
    a_ref,
    b_ref,
    ds_ref,
    wt_ref,
    skip_ref,
    ws_ref,
    dx_ref,
    dab_ref,
    dw_ref,
    dbias_ref,
    dskip_ref,
    dws_ref,
    dwsb_ref,
    xbuf,
    gbuf,
    ybuf,
    awide,
    dyewide,
    pbuf,
    dw_acc,
    dab_acc,
    dbias_acc,
    dws_acc,
    dwsb_acc,
    sems,
    *,
    tile_h: int,
    width: int,
    n_tiles: int,
    skip_mode: str,  # "none" | "identity" | "proj"
    activation: str,
):
    """Fused backward for y = conv3x3(act(x*a+b)) + bias [+ skip|1x1(skip)],
    stats = per-channel (sum, sumsq) of y.

    The forward kernel's training problem (VERDICT round-2 missing #2) was
    that its VJP replayed a full XLA forward — a measured LOSS vs plain XLA
    (3.119 vs 3.489 img/s). This kernel computes ALL cotangents in one
    launch with the same slab pipeline as the forward:

      dye  = g + ds0 + 2*y*ds1                 (stats-chain cotangent, VPU)
      dA   = conv3x3(dye, flipT(W))            (3 MXU GEMMs, K=3N)
      dx   = dA * silu'(t) * a                 (VPU, t recomputed from x)
      da   = sum_hw dA * silu'(t) * x          (per-batch scratch)
      db   = sum_hw dA * silu'(t)
      dW   = A-patches^T @ dye                 (3 MXU GEMMs, K=T*W,
                                                accumulated across the grid)
      dbias= sum dye
      dskip= dye            (identity)  |  dye @ ws^T       (proj)
      dws  = skip^T @ dye   (proj)         dwsb = sum dye   (proj)

    A (the activated input) is recomputed in-VMEM from the streamed x slab
    — nothing but x and y (both already in HBM) is saved by the VJP, so
    training memory matches remat while the backward pays no XLA forward
    replay. Streams: x, g, y ride three double-buffered haloed DMAs; skip
    (proj) needs no halo and arrives as a plain VMEM block.
    """
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    n_b = pl.num_programs(0)
    slot = (bi * n_tiles + hi) % 2
    c_in = xbuf.shape[-1]
    n_out = gbuf.shape[-1]

    def slab_dmas(b_idx, h_idx, into_slot):
        """Haloed slab descriptors for all three streams (same geometry)."""
        for k, (hbm, buf) in enumerate(((x_hbm, xbuf), (g_hbm, gbuf), (y_hbm, ybuf))):
            if n_tiles == 1:
                yield None, pltpu.make_async_copy(
                    hbm.at[b_idx, pl.ds(0, tile_h), :, :],
                    buf.at[into_slot, pl.ds(1, tile_h), pl.ds(8, width), :],
                    sems.at[k, into_slot],
                )
                continue
            h0 = h_idx * tile_h
            if n_tiles > 2:
                yield (
                    jnp.logical_and(h_idx > 0, h_idx < n_tiles - 1),
                    pltpu.make_async_copy(
                        hbm.at[b_idx, pl.ds(h0 - 1, tile_h + 2), :, :],
                        buf.at[into_slot, pl.ds(0, tile_h + 2), pl.ds(8, width), :],
                        sems.at[k, into_slot],
                    ),
                )
            yield h_idx == 0, pltpu.make_async_copy(
                hbm.at[b_idx, pl.ds(0, tile_h + 1), :, :],
                buf.at[into_slot, pl.ds(1, tile_h + 1), pl.ds(8, width), :],
                sems.at[k, into_slot],
            )
            yield h_idx == n_tiles - 1, pltpu.make_async_copy(
                hbm.at[b_idx, pl.ds(h0 - 1, tile_h + 1), :, :],
                buf.at[into_slot, pl.ds(0, tile_h + 1), pl.ds(8, width), :],
                sems.at[k, into_slot],
            )

    def start_slabs(b_idx, h_idx, into_slot):
        for cond, dma in slab_dmas(b_idx, h_idx, into_slot):
            if cond is None:
                dma.start()
            else:
                pl.when(cond)(dma.start)

    def wait_slabs(b_idx, h_idx, into_slot):
        for cond, dma in slab_dmas(b_idx, h_idx, into_slot):
            if cond is None:
                dma.wait()
            else:
                pl.when(cond)(dma.wait)

    @pl.when(jnp.logical_and(bi == 0, hi == 0))
    def _warm():
        start_slabs(bi, hi, slot)

    nxt = bi * n_tiles + hi + 1

    @pl.when(nxt < n_b * n_tiles)
    def _prefetch():
        start_slabs(nxt // n_tiles, nxt % n_tiles, (slot + 1) % 2)

    wait_slabs(bi, hi, slot)

    # ---- dye = g + ds0 + 2*y*ds1 over the whole slab (halo included) ----
    ds0 = ds_ref[0, 0][None, None, :]
    ds1 = ds_ref[0, 1][None, None, :]
    dye = (
        gbuf[slot].astype(jnp.float32)
        + ds0
        + 2.0 * ybuf[slot].astype(jnp.float32) * ds1
    )
    dyewide[:] = dye.astype(dyewide.dtype)
    dyewide[:, 7, :] = jnp.zeros_like(dyewide[:, 7, :])
    dyewide[:, 8 + width, :] = jnp.zeros_like(dyewide[:, 8 + width, :])

    @pl.when(hi == 0)
    def _zero_top_dye():
        dyewide[0] = jnp.zeros_like(dyewide[0])

    @pl.when(hi == n_tiles - 1)
    def _zero_bottom_dye():
        dyewide[tile_h + 1] = jnp.zeros_like(dyewide[tile_h + 1])

    # ---- dA = conv3x3(dye, flipped-transposed W): 3 GEMMs, K=3N ----
    for v in range(3):
        pbuf[:, :, v * n_out : (v + 1) * n_out] = dyewide[:, 7 + v : 7 + v + width, :]
    d_act = jnp.zeros((tile_h * width, c_in), jnp.float32)
    for u in range(3):
        d_act = d_act + jax.lax.dot_general(
            pbuf[u : u + tile_h, :, : 3 * n_out].reshape(tile_h * width, 3 * n_out),
            wt_ref[u],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- pointwise chain rule through act(x*a + b) on the center rows ----
    x_center = xbuf[slot, 1 : tile_h + 1, 8 : 8 + width, :].astype(jnp.float32)
    av = a_ref[0, 0][None, None, :]
    bv = b_ref[0, 0][None, None, :]
    t = x_center * av + bv
    if activation == "silu":
        s = jax.nn.sigmoid(t)
        sp = s * (1.0 + t * (1.0 - s))
    else:
        sp = jnp.ones_like(t)
    d_t = d_act.reshape(tile_h, width, c_in) * sp  # = dA * act'
    dx_ref[0] = (d_t * av).astype(dx_ref.dtype)
    da_part = jnp.sum(d_t * x_center, axis=(0, 1))
    db_part = jnp.sum(d_t, axis=(0, 1))
    dab_part = jnp.stack([da_part, db_part])

    @pl.when(hi == 0)
    def _reset_dab():
        dab_acc[:] = dab_part

    @pl.when(hi > 0)
    def _accum_dab():
        dab_acc[:] = dab_acc[:] + dab_part

    dab_ref[0] = dab_acc[:]

    # ---- dW += A-patches^T @ dye_center (3 GEMMs, K = T*W) ----
    raw = xbuf[slot].astype(jnp.float32)
    act_full = raw * av + bv
    if activation == "silu":
        act_full = act_full * jax.nn.sigmoid(act_full)
    awide[:] = act_full.astype(awide.dtype)
    awide[:, 7, :] = jnp.zeros_like(awide[:, 7, :])
    awide[:, 8 + width, :] = jnp.zeros_like(awide[:, 8 + width, :])

    @pl.when(hi == 0)
    def _zero_top_a():
        awide[0] = jnp.zeros_like(awide[0])

    @pl.when(hi == n_tiles - 1)
    def _zero_bottom_a():
        awide[tile_h + 1] = jnp.zeros_like(awide[tile_h + 1])

    for v in range(3):
        pbuf[:, :, 3 * n_out + v * c_in : 3 * n_out + (v + 1) * c_in] = awide[
            :, 7 + v : 7 + v + width, :
        ]
    dye_center = dyewide[1 : tile_h + 1, 8 : 8 + width, :].reshape(
        tile_h * width, n_out
    )
    first = jnp.logical_and(bi == 0, hi == 0)
    for u in range(3):
        dw_part = jax.lax.dot_general(
            pbuf[u : u + tile_h, :, 3 * n_out :].reshape(tile_h * width, 3 * c_in),
            dye_center,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(first)
        def _reset_dw(u=u, dw_part=dw_part):
            dw_acc[u] = dw_part

        @pl.when(jnp.logical_not(first))
        def _accum_dw(u=u, dw_part=dw_part):
            dw_acc[u] = dw_acc[u] + dw_part

    dw_ref[:] = dw_acc[:]

    dbias_part = jnp.sum(dye_center.astype(jnp.float32), axis=0)

    @pl.when(first)
    def _reset_dbias():
        dbias_acc[0] = dbias_part

    @pl.when(jnp.logical_not(first))
    def _accum_dbias():
        dbias_acc[0] = dbias_acc[0] + dbias_part

    dbias_ref[:] = dbias_acc[0]

    # ---- skip cotangents ----
    if skip_mode == "identity":
        dskip_ref[0] = dye_center.reshape(tile_h, width, n_out).astype(dskip_ref.dtype)
    elif skip_mode == "proj":
        c_skip = skip_ref.shape[-1]
        dskip_ref[0] = (
            jax.lax.dot_general(
                dye_center,
                ws_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            .reshape(tile_h, width, c_skip)
            .astype(dskip_ref.dtype)
        )
        dws_part = jax.lax.dot_general(
            skip_ref[0].reshape(tile_h * width, c_skip),
            dye_center,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(first)
        def _reset_dws():
            dws_acc[:] = dws_part
            dwsb_acc[0] = dbias_part

        @pl.when(jnp.logical_not(first))
        def _accum_dws():
            dws_acc[:] = dws_acc[:] + dws_part
            dwsb_acc[0] = dwsb_acc[0] + dbias_part

        dws_ref[:] = dws_acc[:]
        dwsb_ref[:] = dwsb_acc[0]


def _bwd_operand_adapter(kernel, *args, skip_mode: str):
    """Map variable operand/output lists onto _bwd_kernel's fixed signature."""
    # operands: x, g, y, a, b, ds, wt [, skip] [, ws]
    n_lead = 7
    lead = list(args[:n_lead])
    rest = list(args[n_lead:])
    skip = rest.pop(0) if skip_mode == "proj" else None
    ws = rest.pop(0) if skip_mode == "proj" else None
    # outputs: dx, dab, dw, dbias [, dskip] [, dws, dwsb]; then scratch
    outs = rest[:4]
    rest = rest[4:]
    dskip = rest.pop(0) if skip_mode in ("identity", "proj") else None
    dws = rest.pop(0) if skip_mode == "proj" else None
    dwsb = rest.pop(0) if skip_mode == "proj" else None
    # scratch: xbuf, gbuf, ybuf, awide, dyewide, pbuf, dw_acc, dab_acc,
    # dbias_acc [, dws_acc, dwsb_acc], sems
    if skip_mode == "proj":
        scratch = rest
    else:
        scratch = rest[:9] + [None, None] + rest[9:]
    kernel(*lead, skip, ws, *outs, dskip, dws, dwsb, *scratch)


def _bwd_vmem_bytes(tile_h, width, c_in, n_out, itemsize, c_skip=None):
    return (
        3 * 2 * (tile_h + 2) * (width + 16) * max(c_in, n_out) * itemsize  # 3 streams x2
        + (tile_h + 2) * (width + 16) * (c_in + n_out) * itemsize  # awide + dyewide
        + (tile_h + 2) * width * 3 * (c_in + n_out) * itemsize     # shared pbuf
        + 2 * tile_h * width * c_in * 4                            # dA fp32 + d_t
        + 3 * 3 * c_in * n_out * 4                                 # dw_acc fp32
        + 2 * tile_h * width * c_in * itemsize                     # dx out (2x)
        + (0 if c_skip is None else 2 * tile_h * width * c_skip * itemsize)
        + 2 * tile_h * width * n_out * itemsize                    # dskip out (2x)
    )


BWD_TILE_BUDGET = 70 * 1024 * 1024


def _bwd_pick_tile(height, width, c_in, n_out, itemsize, c_skip=None):
    for tile_h in (32, 16, 8, 4, 2):
        if height % tile_h != 0:
            continue
        if _bwd_vmem_bytes(tile_h, width, c_in, n_out, itemsize, c_skip) <= BWD_TILE_BUDGET:
            return tile_h
    return None


def _chain_bwd_impl(x, a, b, w, bias, skip, ws, y, gy, gstats, tile_h, activation):
    """Pallas fused backward; returns (dx, da, db, dw, dbias, dskip, dws, dwsb).

    Picks its own tile: the backward streams three slabs plus a double-width
    patch buffer, so its VMEM footprint differs from the forward's."""
    bsz, height, width, c_in = x.shape
    n_out = w.shape[-1]
    skip_mode = "none" if skip is None else ("proj" if ws is not None else "identity")
    c_skip = skip.shape[-1] if skip_mode == "proj" else None
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    picked = _bwd_pick_tile(height, width, c_in, n_out, itemsize, c_skip)
    tile_h = picked if picked is not None else tile_h
    n_tiles = height // tile_h

    # flipped-transposed fold for the dA conv: wt[u'] (3N, C)
    wt = (
        w.astype(jnp.float32)[::-1, ::-1]
        .transpose(0, 1, 3, 2)
        .reshape(3, 3 * n_out, c_in)
        .astype(x.dtype)
    )
    gy = gy.astype(x.dtype)
    ds = gstats.astype(jnp.float32)  # (B, 2, N)

    operands = [x, gy, y, a[:, None, :], b[:, None, :], ds, wt]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, 1, c_in), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c_in), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, n_out), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3 * n_out, c_in), lambda bi, hi: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    if skip_mode == "proj":
        operands.extend([skip, ws])
        in_specs.extend([
            pl.BlockSpec(
                (1, tile_h, width, c_skip), lambda bi, hi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c_skip, n_out), lambda bi, hi: (0, 0), memory_space=pltpu.VMEM),
        ])

    out_specs = [
        pl.BlockSpec(
            (1, tile_h, width, c_in), lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, 2, c_in), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3 * c_in, n_out), lambda bi, hi: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, height, width, c_in), x.dtype),
        jax.ShapeDtypeStruct((bsz, 2, c_in), jnp.float32),
        jax.ShapeDtypeStruct((3, 3 * c_in, n_out), jnp.float32),
        jax.ShapeDtypeStruct((n_out,), jnp.float32),
    ]
    if skip_mode != "none":
        dskip_c = c_skip if skip_mode == "proj" else n_out
        out_specs.append(
            pl.BlockSpec(
                (1, tile_h, width, dskip_c), lambda bi, hi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((bsz, height, width, dskip_c), x.dtype))
    if skip_mode == "proj":
        out_specs.extend([
            pl.BlockSpec((c_skip, n_out), lambda bi, hi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ])
        out_shape.extend([
            jax.ShapeDtypeStruct((c_skip, n_out), jnp.float32),
            jax.ShapeDtypeStruct((n_out,), jnp.float32),
        ])

    scratch = [
        pltpu.VMEM((2, tile_h + 2, width + 16, c_in), x.dtype),   # xbuf
        pltpu.VMEM((2, tile_h + 2, width + 16, n_out), x.dtype),  # gbuf
        pltpu.VMEM((2, tile_h + 2, width + 16, n_out), x.dtype),  # ybuf
        pltpu.VMEM((tile_h + 2, width + 16, c_in), x.dtype),      # awide
        pltpu.VMEM((tile_h + 2, width + 16, n_out), x.dtype),     # dyewide
        pltpu.VMEM((tile_h + 2, width, 3 * (c_in + n_out)), x.dtype),  # pbuf
        pltpu.VMEM((3, 3 * c_in, n_out), jnp.float32),            # dw_acc
        pltpu.VMEM((2, c_in), jnp.float32),                       # dab_acc
        pltpu.VMEM((1, n_out), jnp.float32),                      # dbias_acc
    ]
    if skip_mode == "proj":
        scratch.extend([
            pltpu.VMEM((c_skip, n_out), jnp.float32),             # dws_acc
            pltpu.VMEM((1, n_out), jnp.float32),                  # dwsb_acc
        ])
    scratch.append(pltpu.SemaphoreType.DMA((3, 2)))

    vmem = _bwd_vmem_bytes(tile_h, width, c_in, n_out, itemsize, c_skip)
    # _bwd_vmem_bytes feeds the tile PICK (its 70M budget is tuned on the
    # measured 512^2/1024^2 shapes — keep choices stable); the scoped
    # limit must additionally cover the wt input operand and the dW
    # output block, which the estimate omits. At small-spatial/large-
    # channel shapes (8x8x512, i.e. 64px training graphs) those fixed
    # 3*3*C*N terms dominate and the bare 1.5x margin is short: Mosaic
    # requested 20.35M against a 19.77M limit. At large shapes the same
    # margin absorbed them, which is why only tiny shapes failed.
    fixed = 3 * 3 * c_in * n_out * (itemsize + 4)
    kernel = functools.partial(
        _bwd_kernel,
        tile_h=tile_h,
        width=width,
        n_tiles=n_tiles,
        skip_mode=skip_mode,
        activation=activation,
    )
    kernel = functools.partial(_bwd_operand_adapter, kernel, skip_mode=skip_mode)
    results = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int((vmem + fixed) * 1.5) + (2 << 20), 127 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 18 * bsz * height * width * c_in * n_out,
            bytes_accessed=3 * bsz * height * width * max(c_in, n_out) * itemsize,
            transcendentals=bsz * height * width * c_in,
        ),
        interpret=INTERPRET,
    )(*operands)

    dx = results[0]
    dab = results[1]
    dw = results[2].reshape(3, 3, c_in, n_out).astype(w.dtype)
    dbias = results[3]
    da = dab[:, 0]
    db = dab[:, 1]
    idx = 4
    dskip = dws = dwsb = None
    if skip_mode != "none":
        dskip = results[idx]
        idx += 1
    if skip_mode == "proj":
        dws = results[idx].astype(ws.dtype)
        dwsb = results[idx + 1]
    return dx, da, db, dw, dbias, dskip, dws, dwsb


# "kernel": fused Pallas backward (above); "xla": restate + jax.vjp (the
# round-2 behavior — pays a full XLA forward replay inside the backward).
CHAIN_BACKWARD = "kernel"


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _chain(x, a, b, w, bias, skip, ws, wsb, tile_h, activation):
    return _chain_fwd_impl(x, a, b, w, bias, skip, ws, wsb, tile_h, activation)


def _chain_fwd(x, a, b, w, bias, skip, ws, wsb, tile_h, activation):
    out = _chain_fwd_impl(x, a, b, w, bias, skip, ws, wsb, tile_h, activation)
    y, _ = out
    # y is this op's own output (already materialized in HBM): saving it
    # costs no extra memory and lets the fused backward form the stats-
    # chain cotangent dye = g + ds0 + 2*y*ds1 without recomputing y.
    return out, (x, a, b, w, bias, skip, ws, wsb, y)


def _chain_bwd(tile_h, activation, residuals, g):
    x, a, b, w, bias, skip, ws, wsb, y = residuals
    gy, gstats = g

    use_kernel = CHAIN_BACKWARD == "kernel"
    if use_kernel and not INTERPRET:
        try:
            use_kernel = jax.default_backend() == "tpu"
        except Exception:
            use_kernel = False
    if use_kernel:
        itemsize = 2 if x.dtype == jnp.bfloat16 else 4
        c_skip = skip.shape[-1] if ws is not None else None
        use_kernel = (
            _bwd_pick_tile(x.shape[1], x.shape[2], x.shape[3], w.shape[-1],
                           itemsize, c_skip)
            is not None
        )
    if use_kernel:
        dx, da, db, dw, dbias, dskip, dws, dwsb = _chain_bwd_impl(
            x, a, b, w, bias, skip, ws, y, gy, gstats, tile_h, activation
        )
        return (
            dx,
            da,
            db,
            dw.astype(w.dtype),
            dbias.astype(bias.dtype),
            dskip if skip is not None else None,
            dws if ws is not None else None,
            # dwsb = d(bias-like) of the projection output = sum dye
            dwsb.astype(wsb.dtype) if wsb is not None else None,
        )

    args = [x, a, b, w, bias]
    if skip is not None:
        args.append(skip)
    if ws is not None:
        args.extend([ws, wsb])

    def restate(*diff_args):
        it = iter(diff_args)
        xx, aa, bb, ww, bb2 = (next(it) for _ in range(5))
        sk = next(it) if skip is not None else None
        pw = next(it) if ws is not None else None
        pb = next(it) if ws is not None else None
        return _xla_chain(xx, aa, bb, ww, bb2, sk, pw, pb, activation)

    _, vjp = jax.vjp(restate, *args)
    grads = list(vjp(g))
    out = grads[:5]
    out.append(grads[5] if skip is not None else None)
    if ws is not None:
        out.extend(grads[6:8])
    else:
        out.extend([None, None])
    return tuple(out)


_chain.defvjp(_chain_fwd, _chain_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _wino_chain(x, a, b, w, bias, skip, ws, wsb, tile_h, activation):
    return _wino_fwd_impl(x, a, b, w, bias, skip, ws, wsb, tile_h, activation)


def _wino_fwd(x, a, b, w, bias, skip, ws, wsb, tile_h, activation):
    out = _wino_fwd_impl(x, a, b, w, bias, skip, ws, wsb, tile_h, activation)
    y, _ = out
    return out, (x, a, b, w, bias, skip, ws, wsb, y)


# backward: same fused Pallas backward as the direct chain (identical
# primal function; _chain_bwd_impl picks its own tile)
_wino_chain.defvjp(_wino_fwd, _chain_bwd)


# Module default for the stride-1 3x3 chain kernel: "direct" = implicit-
# im2col GEMMs (K=3C), "winograd" = in-VMEM F(2x2, 3x3) (K=C, 4/9 MACs).
# Per-call `algo=` overrides; benchmarks A/B both.
CONV_ALGO = "direct"


def gn_silu_conv3x3_stats(
    x: Array,
    a: Array,
    b: Array,
    w: Array,
    bias: Array,
    skip: Optional[Array] = None,
    *,
    proj: Optional[Tuple[Array, Array]] = None,
    activation: str = "silu",
    tile_h: Optional[int] = None,
    force_xla: bool = False,
    algo: Optional[str] = None,
) -> Tuple[Array, Array]:
    """y = conv3x3(act(x*a + b)) + bias [+ skip or 1x1(skip)]; also returns
    per-channel (sum, sumsq) of y as (B, 2, N) fp32 — the next GroupNorm's
    statistics for free. x: (B, H, W, C); a, b: (B, C) fp32 folded GN
    coefficients. `proj=(ws, wsb)` runs the 1x1 conv_shortcut on `skip`
    IN-KERNEL (ws: (C_skip, N)); `activation` is "silu" or "identity"
    (identity + unit coeffs = a bare conv, e.g. the decoder upsample conv)."""
    bsz, height, width, c_in = x.shape
    n_out = w.shape[-1]
    ws, wsb = proj if proj is not None else (None, None)
    on_tpu = False
    try:
        on_tpu = jax.default_backend() == "tpu" or INTERPRET
    except Exception:
        pass
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    c_skip = skip.shape[-1] if ws is not None else None
    chosen = algo or CONV_ALGO
    if chosen == "winograd" and not force_xla and on_tpu:
        wino_aligned = (
            height % 2 == 0
            and width % 16 == 0
            and c_in % 128 == 0
            and n_out % 128 == 0
            and (c_skip is None or c_skip % 128 == 0)
        )
        if wino_aligned:
            wt, _ = _wino_pick_tile(height, width // 2, c_in, n_out, itemsize, c_skip)
            if wt is not None:
                return _wino_chain(x, a, b, w, bias, skip, ws, wsb, wt, activation)
        # fall through to the direct kernel on misaligned/oversized shapes
    if tile_h is None:
        picked, _ = _pick_tile_h(height, width, c_in, n_out, itemsize, c_skip)
    else:
        picked = (
            tile_h
            if _vmem_bytes(tile_h, width, c_in, n_out, itemsize, c_skip) <= MAX_VMEM_BYTES
            else None
        )
    aligned = (
        picked is not None
        and width % 8 == 0
        and c_in % 128 == 0
        and n_out % 128 == 0
        and (c_skip is None or c_skip % 128 == 0)
    )
    if force_xla or not on_tpu or not aligned:
        return _xla_chain(x, a, b, w, bias, skip, ws, wsb, activation)
    return _chain(x, a, b, w, bias, skip, ws, wsb, picked, activation)


def stats_to_coeffs(
    stats: Array,
    scale: Array,
    bias: Array,
    num_groups: int,
    hw: int,
    eps: float = 1e-6,
) -> Tuple[Array, Array]:
    """Fold per-channel (sum, sumsq) into per-(B, C) GroupNorm coefficients
    a, b with gn(x) = x*a + b. stats: (B, 2, C) fp32; hw = H*W."""
    bsz, _, c = stats.shape
    cg = c // num_groups
    g_sums = stats.reshape(bsz, 2, num_groups, cg).sum(axis=-1)  # (B, 2, G)
    count = hw * cg
    mean = g_sums[:, 0] / count
    meansq = g_sums[:, 1] / count
    rstd = jax.lax.rsqrt(meansq - jnp.square(mean) + eps)
    rstd_c = jnp.repeat(rstd, cg, axis=1)
    mean_c = jnp.repeat(mean, cg, axis=1)
    a = scale[None, :].astype(jnp.float32) * rstd_c
    b = bias[None, :].astype(jnp.float32) - mean_c * a
    return a, b


def tensor_stats(x: Array) -> Array:
    """Per-channel (sum, sumsq) of x as (B, 2, C) fp32 — the chain seed for
    the first fused block after a non-fused producer."""
    xf = x.astype(jnp.float32)
    return jnp.stack([jnp.sum(xf, axis=(1, 2)), jnp.sum(jnp.square(xf), axis=(1, 2))], axis=1)


def _downsample_kernel(
    x_hbm,
    w_ref,
    bias_ref,
    out_ref,
    stats_ref,
    xbuf,
    pbuf,
    acc_ref,
    sems,
    *,
    tile_h: int,
    width_out: int,
    n_tiles: int,
):
    """conv3x3 stride-2, pad ((0,1),(0,1)) (diffusers Downsample2D) as
    dense GEMMs — XLA's stride-2 conv emitter runs at ~32 TF/s on these
    shapes (benchmarks/downsample_probe.py) vs ~110 for dense GEMMs.

    Input arrives pre-viewed as (B, H, W/2, 2C) — a FREE reshape: the NHWC
    linear layout of adjacent column pairs IS channel-doubling — so the
    column stride-2 is just channel halves. Row stride-2 is a leading-dim
    regroup of the slab value ((2T+2, Wp, 2C) -> (T+1, 2, Wp, 2C)); row
    taps u in {0,1,2} are then (parity, offset) picks. Per u, two
    pair-shifted copies build a K=4C patch (weights [W_u0; W_u1; W_u2; 0]
    — 1.33x the 9C MACs, all dense). Stats epilogue seeds the next
    encoder level's first block (the chain previously broke here)."""
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    n_b = pl.num_programs(0)
    slot = (bi * n_tiles + hi) % 2
    c2 = xbuf.shape[-1]  # = 2C
    n_out = out_ref.shape[-1]

    def slab_dma(b_idx, h_idx, into_slot):
        # out rows [h0', h0'+T) need input rows [2h0', 2h0'+2T+1); the
        # last tile's +1 halo row is the bottom zero-pad (H = 2H' exactly)
        h0 = h_idx * 2 * tile_h
        if n_tiles == 1:
            yield None, pltpu.make_async_copy(
                x_hbm.at[b_idx, pl.ds(0, 2 * tile_h), :, :],
                xbuf.at[into_slot, pl.ds(0, 2 * tile_h), pl.ds(0, width_out), :],
                sems.at[into_slot],
            )
            return
        yield h_idx < n_tiles - 1, pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(h0, 2 * tile_h + 1), :, :],
            xbuf.at[into_slot, pl.ds(0, 2 * tile_h + 1), pl.ds(0, width_out), :],
            sems.at[into_slot],
        )
        yield h_idx == n_tiles - 1, pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(h0, 2 * tile_h), :, :],
            xbuf.at[into_slot, pl.ds(0, 2 * tile_h), pl.ds(0, width_out), :],
            sems.at[into_slot],
        )

    def start_slab(b_idx, h_idx, into_slot):
        for cond, dma in slab_dma(b_idx, h_idx, into_slot):
            if cond is None:
                dma.start()
            else:
                pl.when(cond)(dma.start)

    def wait_slab(b_idx, h_idx, into_slot):
        for cond, dma in slab_dma(b_idx, h_idx, into_slot):
            if cond is None:
                dma.wait()
            else:
                pl.when(cond)(dma.wait)

    @pl.when(jnp.logical_and(bi == 0, hi == 0))
    def _warm():
        start_slab(bi, hi, slot)

    nxt = bi * n_tiles + hi + 1

    @pl.when(nxt < n_b * n_tiles)
    def _prefetch():
        start_slab(nxt // n_tiles, nxt % n_tiles, (slot + 1) % 2)

    wait_slab(bi, hi, slot)

    # right-pad pair column and (on the last tile) bottom halo row are zero
    xbuf[slot, :, width_out, :] = jnp.zeros_like(xbuf[slot, :, width_out, :])

    @pl.when(hi == n_tiles - 1)
    def _zero_bottom():
        xbuf[slot, 2 * tile_h, :, :] = jnp.zeros_like(xbuf[slot, 2 * tile_h, :, :])

    slab = xbuf[slot]  # (2T+2, Wp, 2C)
    rows = slab.reshape(tile_h + 1, 2, width_out + 8, c2)
    # row taps: u=0 -> (r', even), u=1 -> (r', odd), u=2 -> (r'+1, even)
    sel = [
        rows[0:tile_h, 0],
        rows[0:tile_h, 1],
        rows[1 : tile_h + 1, 0],
    ]
    for u in range(3):
        for s in range(2):
            pbuf[:, :, (2 * u + s) * c2 : (2 * u + s + 1) * c2] = sel[u][
                :, s : s + width_out, :
            ]

    acc = jnp.zeros((tile_h * width_out, n_out), jnp.float32)
    for u in range(3):
        acc = acc + jax.lax.dot_general(
            pbuf[:, :, 2 * u * c2 : (2 * u + 2) * c2].reshape(
                tile_h * width_out, 2 * c2
            ),
            w_ref[u],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y = acc + bias_ref[:][None, :]
    y_store = y.astype(out_ref.dtype)
    out_ref[0] = y_store.reshape(tile_h, width_out, n_out)

    yf = y_store.astype(jnp.float32)
    part = jnp.stack([jnp.sum(yf, axis=0), jnp.sum(jnp.square(yf), axis=0)])

    @pl.when(hi == 0)
    def _reset():
        acc_ref[:] = part

    @pl.when(hi > 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + part

    stats_ref[0] = acc_ref[:]


def _fold_downsample_weights(w: Array) -> Array:
    """(3, 3, C, N) -> (3, 4C, N): per row tap u, the K=4C contraction is
    [W[u,0] (pair even-half); W[u,1] (odd-half); W[u,2] (next pair even);
    zeros (next pair odd — never read by this window)]."""
    c_in, n_out = w.shape[2], w.shape[3]
    zeros = jnp.zeros((c_in, n_out), w.dtype)
    return jnp.stack(
        [jnp.concatenate([w[u, 0], w[u, 1], w[u, 2], zeros], axis=0) for u in range(3)],
        axis=0,
    )


def _xla_downsample_conv(x, w, bias):
    """Literal conv3x3 stride-2 pad ((0,1),(0,1)) (+ stats) — fallback/VJP."""
    y = lax.conv_general_dilated(
        x, w, (2, 2), ((0, 1), (0, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + bias.astype(jnp.float32)[None, None, None, :]
    y = y.astype(x.dtype)
    yf = y.astype(jnp.float32)
    stats = jnp.stack(
        [jnp.sum(yf, axis=(1, 2)), jnp.sum(jnp.square(yf), axis=(1, 2))], axis=1
    )
    return y, stats


def _downsample_vmem_bytes(tile_h, width_out, c2, n_out, itemsize):
    return (
        2 * (2 * tile_h + 2) * (width_out + 8) * c2 * itemsize  # xbuf x2
        + tile_h * width_out * 6 * c2 * itemsize                # pbuf (K=12C)
        + tile_h * width_out * n_out * 4                        # accumulator
        + 2 * tile_h * width_out * n_out * itemsize             # out (2x)
        + 3 * 2 * c2 * n_out * itemsize                         # weights
        + (2 * tile_h + 2) * (width_out + 8) * c2 * itemsize    # slab value copy
    )


def _downsample_fwd_impl(x, w, bias, tile_h):
    bsz, height, width, c_in = x.shape
    n_out = w.shape[-1]
    w2 = width // 2
    h_out = height // 2
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    if tile_h is None:
        for cand in (32, 16, 8, 4):
            if h_out % cand == 0 and _downsample_vmem_bytes(
                cand, w2, 2 * c_in, n_out, itemsize
            ) <= MAX_VMEM_BYTES:
                tile_h = cand
                break
    vmem = _downsample_vmem_bytes(tile_h, w2, 2 * c_in, n_out, itemsize)
    x6 = x.reshape(bsz, height, w2, 2 * c_in)  # free: NHWC pair-channel view
    w_fold = _fold_downsample_weights(w.astype(jnp.float32)).astype(x.dtype)
    kernel = functools.partial(
        _downsample_kernel, tile_h=tile_h, width_out=w2, n_tiles=h_out // tile_h
    )
    y, stats = pl.pallas_call(
        kernel,
        grid=(bsz, h_out // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (3, 4 * c_in, n_out), lambda bi, hi: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tile_h, w2, n_out), lambda bi, hi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 2, n_out), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h_out, w2, n_out), x.dtype),
            jax.ShapeDtypeStruct((bsz, 2, n_out), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * tile_h + 2, w2 + 8, 2 * c_in), x.dtype),
            pltpu.VMEM((tile_h, w2, 6 * 2 * c_in), x.dtype),
            pltpu.VMEM((2, n_out), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem * 1.6) + (2 << 20), 127 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 12 * bsz * h_out * w2 * c_in * n_out,
            bytes_accessed=(x.size + bsz * h_out * w2 * n_out) * itemsize,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(x6, w_fold, bias)
    return y, stats


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _downsample_chain(x, w, bias, tile_h):
    return _downsample_fwd_impl(x, w, bias, tile_h)


def _downsample_fwd(x, w, bias, tile_h):
    return _downsample_fwd_impl(x, w, bias, tile_h), (x, w, bias)


def _downsample_bwd(tile_h, residuals, g):
    x, w, bias = residuals
    _, vjp = jax.vjp(_xla_downsample_conv, x, w, bias)
    return vjp(g)


_downsample_chain.defvjp(_downsample_fwd, _downsample_bwd)


def fused_downsample_conv3x3_stats(
    x: Array, w: Array, bias: Array, *, force_xla: bool = False
) -> Tuple[Array, Array]:
    """conv3x3 stride-2 pad ((0,1),(0,1)) + bias with the stats epilogue
    (diffusers Downsample2D numerics)."""
    bsz, height, width, c_in = x.shape
    n_out = w.shape[-1]
    on_tpu = False
    try:
        on_tpu = jax.default_backend() == "tpu" or INTERPRET
    except Exception:
        pass
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    picked = None
    if height % 2 == 0 and width % 2 == 0:
        for cand in (32, 16, 8, 4):
            if (height // 2) % cand == 0 and _downsample_vmem_bytes(
                cand, width // 2, 2 * c_in, n_out, itemsize
            ) <= MAX_VMEM_BYTES:
                picked = cand
                break
    aligned = (
        picked is not None
        and (width // 2) % 8 == 0
        and c_in % 128 == 0
        and n_out % 128 == 0
    )
    if force_xla or not on_tpu or not aligned:
        return _xla_downsample_conv(x, w, bias)
    return _downsample_chain(x, w, bias, picked)


# the interleave (concat + stack + cast + stats re-read) makes Mosaic's
# stack allocation hard to model exactly; measured ~1.6x the naive sum at
# (128, 512) — budget tiles conservatively and set the limit with slack
SUBPIXEL_TILE_BUDGET = 55 * 1024 * 1024


def _subpixel_vmem_bytes(tile_h, width, c_in, n_out, itemsize):
    return (
        2 * (tile_h + 2) * (width + 16) * c_in * itemsize  # xbuf x2
        + (tile_h + 2) * (width + 16) * c_in * itemsize    # awide
        + (tile_h + 2) * width * 3 * c_in * itemsize       # pbuf
        + 4 * tile_h * width * n_out * 4                   # four fp32 accumulators
        + 4 * tile_h * width * 2 * n_out * 4               # interleave transients
        + 8 * 2 * c_in * n_out * itemsize                  # folded weights
        + 4 * tile_h * width * 2 * n_out * itemsize        # out (2x buffered)
    )


def _xla_upsample_conv(x, w, bias):
    """Literal nearest-2x + conv3x3 (+ stats) — fallback and VJP replay."""
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    y = lax.conv_general_dilated(
        up, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + bias.astype(jnp.float32)[None, None, None, :]
    y = y.astype(x.dtype)
    yf = y.astype(jnp.float32)
    stats = jnp.stack(
        [jnp.sum(yf, axis=(1, 2)), jnp.sum(jnp.square(yf), axis=(1, 2))], axis=1
    )
    return y, stats


def _subpixel_fwd_impl(x, w, bias, tile_h):
    bsz, height, width, c_in = x.shape
    n_out = w.shape[-1]
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    if tile_h is None:
        for cand in (32, 16, 8, 4):
            if height % cand == 0 and _subpixel_vmem_bytes(
                cand, width, c_in, n_out, itemsize
            ) <= SUBPIXEL_TILE_BUDGET:
                tile_h = cand
                break
        else:
            # the public entry (fused_upsample_conv3x3_stats) routes such
            # shapes to _xla_upsample_conv BEFORE entering the chain; an
            # internal caller reaching here must hear why, not a TypeError
            raise ValueError(
                f"no subpixel tile fits h={height} w={width} C={c_in} "
                f"N={n_out} under {SUBPIXEL_TILE_BUDGET >> 20} MiB VMEM; "
                "use fused_upsample_conv3x3_stats (XLA fallback) instead"
            )
    vmem = _subpixel_vmem_bytes(tile_h, width, c_in, n_out, itemsize)
    # fold in fp32: summing re-associated taps in bf16 costs ~4x the
    # output error of the fp32 fold (measured on-chip)
    w_fold = _fold_subpixel_weights(w.astype(jnp.float32)).astype(x.dtype)
    kernel = functools.partial(
        _subpixel_kernel, tile_h=tile_h, width=width, n_tiles=height // tile_h
    )
    y, stats = pl.pallas_call(
        kernel,
        grid=(bsz, height // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (2, 2, 2, 2 * c_in, n_out),
                lambda bi, hi: (0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 2 * tile_h, width, 2 * n_out),
                lambda bi, hi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 2, n_out), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            # (B, 2H, W, 2N) is bit-identical NHWC linear layout to
            # (B, 2H, 2W, N): adjacent column pair == channel halves
            jax.ShapeDtypeStruct((bsz, 2 * height, width, 2 * n_out), x.dtype),
            jax.ShapeDtypeStruct((bsz, 2, n_out), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, width + 16, c_in), x.dtype),
            pltpu.VMEM((tile_h + 2, width + 16, c_in), x.dtype),
            pltpu.VMEM((tile_h + 2, width, 3 * c_in), x.dtype),
            pltpu.VMEM((2, n_out), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem * 2.2) + (2 << 20), 127 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 16 * bsz * height * width * c_in * n_out,
            bytes_accessed=(x.size + 4 * x.size * n_out // c_in) * itemsize,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(x, w_fold, bias)
    return y.reshape(bsz, 2 * height, 2 * width, n_out), stats


def _subpixel_bwd_kernel(
    x_hbm,
    g_hbm,
    y_hbm,
    ds_ref,
    wb_ref,
    dx_ref,
    dwf_ref,
    dbias_ref,
    xbuf,
    gbuf,
    ybuf,
    awide,
    dyewide,
    pbuf,
    pxbuf,
    dwf_acc,
    dbias_acc,
    sems,
    *,
    tile_h: int,
    width: int,
    n_tiles: int,
):
    """Fused backward for the subpixel upsample-conv (y = conv3x3(up2x(x))
    + bias, stats = per-channel (sum, sumsq) of y).

    The XLA-replay VJP this replaces materializes the 4x upsampled tensor
    TWICE (forward replay + dUp) and runs two full-resolution convs. Here
    everything stays in the SMALL domain:

      dye = g + ds0 + 2*y*ds1       (stats-chain cotangent; g, y stream in
                                     the (B, 2H, W, 2N) pair-channel view)
      dx  = "conv4x4 stride 2" of dye with doubly-folded weights: the 2x2
            cell-sum of the transpose conv re-associates exactly like the
            forward fold — row taps {2h-1..2h+2} carry [W2, W1+W2, W0+W1,
            W0], columns likewise, so dx costs 16 HWCN MACs (the forward's
            own subpixel cost) as 4 MXU GEMMs with K=4N. Stride-2 row
            access is the (T+2, 2) leading-dim regroup; stride-2 columns
            are pair-channel halves (both free views).
      dWf = x-patches^T @ dye(parity a, b): 8 GEMMs (K = T*W) into the
            FOLDED-weight cotangent, grid-accumulated in fp32; the host
            unfolds via the exact linear adjoint (jax.vjp of the fold).
      dbias = sum dye (center rows).
    """
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    n_b = pl.num_programs(0)
    slot = (bi * n_tiles + hi) % 2
    c_in = xbuf.shape[-1]
    n2 = gbuf.shape[-1]  # = 2N (pair view)
    n_out = n2 // 2
    th2 = 2 * tile_h

    def slab_dmas(b_idx, h_idx, into_slot):
        # x: small-domain rows [h0-1, h0+T+1) (same geometry as the forward)
        if n_tiles == 1:
            yield None, pltpu.make_async_copy(
                x_hbm.at[b_idx, pl.ds(0, tile_h), :, :],
                xbuf.at[into_slot, pl.ds(1, tile_h), pl.ds(8, width), :],
                sems.at[0, into_slot],
            )
        else:
            h0 = h_idx * tile_h
            if n_tiles > 2:
                yield (
                    jnp.logical_and(h_idx > 0, h_idx < n_tiles - 1),
                    pltpu.make_async_copy(
                        x_hbm.at[b_idx, pl.ds(h0 - 1, tile_h + 2), :, :],
                        xbuf.at[into_slot, pl.ds(0, tile_h + 2), pl.ds(8, width), :],
                        sems.at[0, into_slot],
                    ),
                )
            yield h_idx == 0, pltpu.make_async_copy(
                x_hbm.at[b_idx, pl.ds(0, tile_h + 1), :, :],
                xbuf.at[into_slot, pl.ds(1, tile_h + 1), pl.ds(8, width), :],
                sems.at[0, into_slot],
            )
            yield h_idx == n_tiles - 1, pltpu.make_async_copy(
                x_hbm.at[b_idx, pl.ds(h0 - 1, tile_h + 1), :, :],
                xbuf.at[into_slot, pl.ds(0, tile_h + 1), pl.ds(8, width), :],
                sems.at[0, into_slot],
            )
        # g, y: 2x-domain rows [2h0-2, 2h0+2T+2) — slab row 0 is EVEN so the
        # (T+2, 2) parity regroup aligns; only rows [1, 2T+2] are read.
        for k, (hbm, buf) in enumerate(((g_hbm, gbuf), (y_hbm, ybuf))):
            if n_tiles == 1:
                yield None, pltpu.make_async_copy(
                    hbm.at[b_idx, pl.ds(0, th2), :, :],
                    buf.at[into_slot, pl.ds(2, th2), pl.ds(8, width), :],
                    sems.at[k + 1, into_slot],
                )
                continue
            h0 = h_idx * th2
            if n_tiles > 2:
                yield (
                    jnp.logical_and(h_idx > 0, h_idx < n_tiles - 1),
                    pltpu.make_async_copy(
                        hbm.at[b_idx, pl.ds(h0 - 2, th2 + 4), :, :],
                        buf.at[into_slot, pl.ds(0, th2 + 4), pl.ds(8, width), :],
                        sems.at[k + 1, into_slot],
                    ),
                )
            yield h_idx == 0, pltpu.make_async_copy(
                hbm.at[b_idx, pl.ds(0, th2 + 2), :, :],
                buf.at[into_slot, pl.ds(2, th2 + 2), pl.ds(8, width), :],
                sems.at[k + 1, into_slot],
            )
            yield h_idx == n_tiles - 1, pltpu.make_async_copy(
                hbm.at[b_idx, pl.ds(h0 - 2, th2 + 2), :, :],
                buf.at[into_slot, pl.ds(0, th2 + 2), pl.ds(8, width), :],
                sems.at[k + 1, into_slot],
            )

    def start_slabs(b_idx, h_idx, into_slot):
        for cond, dma in slab_dmas(b_idx, h_idx, into_slot):
            if cond is None:
                dma.start()
            else:
                pl.when(cond)(dma.start)

    def wait_slabs(b_idx, h_idx, into_slot):
        for cond, dma in slab_dmas(b_idx, h_idx, into_slot):
            if cond is None:
                dma.wait()
            else:
                pl.when(cond)(dma.wait)

    @pl.when(jnp.logical_and(bi == 0, hi == 0))
    def _warm():
        start_slabs(bi, hi, slot)

    nxt = bi * n_tiles + hi + 1

    @pl.when(nxt < n_b * n_tiles)
    def _prefetch():
        start_slabs(nxt // n_tiles, nxt % n_tiles, (slot + 1) % 2)

    wait_slabs(bi, hi, slot)

    # ---- dye = g + ds0 + 2*y*ds1 over the whole 2x slab ----
    ds0 = ds_ref[0, 0][None, None, :]
    ds1 = ds_ref[0, 1][None, None, :]
    dye = (
        gbuf[slot].astype(jnp.float32)
        + ds0
        + 2.0 * ybuf[slot].astype(jnp.float32) * ds1
    )
    dyewide[:] = dye.astype(dyewide.dtype)
    # pair-column margins = dye columns outside the image -> zero
    dyewide[:, 7, :] = jnp.zeros_like(dyewide[:, 7, :])
    dyewide[:, 8 + width, :] = jnp.zeros_like(dyewide[:, 8 + width, :])

    # halo rows outside the image: slab row 1 = dye row -1 (hi == 0), slab
    # row 2T+2 = dye row 2H (hi == last). Rows 0 / 2T+3 are never read.
    @pl.when(hi == 0)
    def _zero_top():
        dyewide[1] = jnp.zeros_like(dyewide[1])

    @pl.when(hi == n_tiles - 1)
    def _zero_bottom():
        dyewide[th2 + 2] = jnp.zeros_like(dyewide[th2 + 2])

    # column taps of dx's stride-2 conv: dye col 2w+s-1 for s in {0..3}
    # = pair (w-1) odd | pair w even | pair w odd | pair (w+1) even
    dvg = dyewide[:].reshape(tile_h + 2, 2, width + 16, n2)
    pbuf[:, :, :, 0 * n_out : 1 * n_out] = dvg[:, :, 7 : 7 + width, n_out:]
    pbuf[:, :, :, 1 * n_out : 2 * n_out] = dvg[:, :, 8 : 8 + width, :n_out]
    pbuf[:, :, :, 2 * n_out : 3 * n_out] = dvg[:, :, 8 : 8 + width, n_out:]
    pbuf[:, :, :, 3 * n_out : 4 * n_out] = dvg[:, :, 9 : 9 + width, :n_out]

    # ---- dx: 4 GEMMs (row taps), K = 4N; dye row 2h+r-1 = group/parity ----
    acc = jnp.zeros((tile_h * width, c_in), jnp.float32)
    for r, (g0, par) in enumerate(((0, 1), (1, 0), (1, 1), (2, 0))):
        acc = acc + jax.lax.dot_general(
            pbuf[g0 : g0 + tile_h, par].reshape(tile_h * width, 4 * n_out),
            wb_ref[r],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dx_ref[0] = acc.reshape(tile_h, width, c_in).astype(dx_ref.dtype)

    # ---- dWfold: x-patches^T @ dye(parity) — 8 GEMMs, K = T*W ----
    awide[:] = xbuf[slot]
    awide[:, 7, :] = jnp.zeros_like(awide[:, 7, :])
    awide[:, 8 + width, :] = jnp.zeros_like(awide[:, 8 + width, :])

    @pl.when(hi == 0)
    def _zero_top_x():
        awide[0] = jnp.zeros_like(awide[0])

    @pl.when(hi == n_tiles - 1)
    def _zero_bottom_x():
        awide[tile_h + 1] = jnp.zeros_like(awide[tile_h + 1])

    for v in range(3):
        pxbuf[:, :, v * c_in : (v + 1) * c_in] = awide[:, 7 + v : 7 + v + width, :]

    first = jnp.logical_and(bi == 0, hi == 0)
    # dye center rows 2h+a live at slab rows 2(Δ+1)+a = group Δ+1, parity a
    for a in range(2):
        dye_a = dvg[1 : tile_h + 1, a, 8 : 8 + width, :].reshape(
            tile_h * width, n2
        )
        for b in range(2):
            dye_ab = dye_a[:, b * n_out : (b + 1) * n_out]
            for u in range(2):
                idx = a * 4 + b * 2 + u
                dwf_part = jax.lax.dot_general(
                    pxbuf[a + u : a + u + tile_h, :, b * c_in : (b + 2) * c_in]
                    .reshape(tile_h * width, 2 * c_in),
                    dye_ab,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

                @pl.when(first)
                def _reset(idx=idx, dwf_part=dwf_part):
                    dwf_acc[idx] = dwf_part

                @pl.when(jnp.logical_not(first))
                def _accum(idx=idx, dwf_part=dwf_part):
                    dwf_acc[idx] = dwf_acc[idx] + dwf_part

    dwf_ref[:] = dwf_acc[:]

    # ---- dbias = sum dye over the center (both pair halves) ----
    center = dvg[1 : tile_h + 1, :, 8 : 8 + width, :].astype(jnp.float32)
    dbias_part = jnp.sum(center.reshape(-1, 2, n_out), axis=(0, 1))

    @pl.when(first)
    def _reset_dbias():
        dbias_acc[0] = dbias_part

    @pl.when(jnp.logical_not(first))
    def _accum_dbias():
        dbias_acc[0] = dbias_acc[0] + dbias_part

    dbias_ref[:] = dbias_acc[0]


def _fold_subpixel_bwd_weights(w: Array) -> Array:
    """(3, 3, C, N) -> (4, 4N, C) doubly-folded transpose weights for the
    backward's stride-2 "conv4x4": row tap r (dye row offset r-1) sums the
    (a, u) pairs with a+1-u = r-1 — [W2, W1+W2, W0+W1, W0] — and columns
    fold identically; each (C, N) slice transposes into the K=4N GEMM."""
    wf = w.astype(jnp.float32)
    rows = [wf[2], wf[1] + wf[2], wf[0] + wf[1], wf[0]]  # (3, C, N) each
    out = []
    for r in rows:
        cols = [r[2], r[1] + r[2], r[0] + r[1], r[0]]  # (C, N) each
        out.append(jnp.concatenate([c.T for c in cols], axis=0))  # (4N, C)
    return jnp.stack(out, axis=0)


def _subpixel_bwd_vmem_bytes(tile_h, width, c_in, n_out, itemsize):
    n2 = 2 * n_out
    return (
        2 * (tile_h + 2) * (width + 16) * c_in * itemsize      # xbuf x2
        + 2 * 2 * (2 * tile_h + 4) * (width + 16) * n2 * itemsize  # g, y x2
        + (tile_h + 2) * (width + 16) * c_in * itemsize        # awide
        + (2 * tile_h + 4) * (width + 16) * n2 * itemsize      # dyewide
        + (2 * tile_h + 4) * (width + 16) * n2 * 4             # dye transient
        + (tile_h + 2) * 2 * width * 4 * n_out * itemsize      # pbuf
        + (tile_h + 2) * width * 3 * c_in * itemsize           # pxbuf
        + tile_h * width * c_in * 4                            # dx accumulator
        + 8 * 2 * c_in * n_out * 4                             # dwf_acc fp32
        + 8 * 2 * c_in * n_out * 4                             # dwf OUT block
        + 2 * n_out * 4                                        # dbias out + acc
        + 4 * 4 * n_out * c_in * itemsize                      # folded weights
        + 2 * tile_h * width * c_in * itemsize                 # dx out (2x)
    )


SUBPIXEL_BWD_TILE_BUDGET = 70 * 1024 * 1024


def _subpixel_bwd_pick_tile(height, width, c_in, n_out, itemsize):
    for tile_h in (16, 8, 4, 2):
        if height % tile_h != 0:
            continue
        if (
            _subpixel_bwd_vmem_bytes(tile_h, width, c_in, n_out, itemsize)
            <= SUBPIXEL_BWD_TILE_BUDGET
        ):
            return tile_h
    return None


def _subpixel_bwd_impl(x, w, bias, y, gy, gstats, tile_h):
    """Pallas fused backward; returns (dx, dw, dbias)."""
    bsz, height, width, c_in = x.shape
    n_out = w.shape[-1]
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    n_tiles = height // tile_h

    g6 = gy.astype(x.dtype).reshape(bsz, 2 * height, width, 2 * n_out)
    y6 = y.reshape(bsz, 2 * height, width, 2 * n_out)
    # pair-channel layout repeats each n for both column parities
    ds = jnp.concatenate([gstats, gstats], axis=-1).astype(jnp.float32)
    wb = _fold_subpixel_bwd_weights(w).astype(x.dtype)

    vmem = _subpixel_bwd_vmem_bytes(tile_h, width, c_in, n_out, itemsize)
    kernel = functools.partial(
        _subpixel_bwd_kernel, tile_h=tile_h, width=width, n_tiles=n_tiles
    )
    dx, dwf, dbias = pl.pallas_call(
        kernel,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, 2, 2 * n_out), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (4, 4 * n_out, c_in), lambda bi, hi: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tile_h, width, c_in),
                lambda bi, hi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, 2 * c_in, n_out), lambda bi, hi: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, height, width, c_in), x.dtype),
            jax.ShapeDtypeStruct((8, 2 * c_in, n_out), jnp.float32),
            jax.ShapeDtypeStruct((n_out,), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, width + 16, c_in), x.dtype),
            pltpu.VMEM((2, 2 * tile_h + 4, width + 16, 2 * n_out), x.dtype),
            pltpu.VMEM((2, 2 * tile_h + 4, width + 16, 2 * n_out), x.dtype),
            pltpu.VMEM((tile_h + 2, width + 16, c_in), x.dtype),
            pltpu.VMEM((2 * tile_h + 4, width + 16, 2 * n_out), x.dtype),
            pltpu.VMEM((tile_h + 2, 2, width, 4 * n_out), x.dtype),
            pltpu.VMEM((tile_h + 2, width, 3 * c_in), x.dtype),
            pltpu.VMEM((8, 2 * c_in, n_out), jnp.float32),
            pltpu.VMEM((1, n_out), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(int(vmem * 1.5) + (2 << 20), 127 * 1024 * 1024),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 32 * bsz * height * width * c_in * n_out,
            bytes_accessed=(x.size + 2 * 8 * bsz * height * width * n_out)
            * itemsize,
            transcendentals=0,
        ),
        interpret=INTERPRET,
    )(x, g6, y6, ds, wb)

    # unfold the folded-weight cotangent: the fold is linear, so its exact
    # adjoint is jax.vjp of the fold itself (fp32, matching the forward fold)
    dwf = dwf.reshape(2, 2, 2, 2 * c_in, n_out)
    _, unfold = jax.vjp(_fold_subpixel_weights, w.astype(jnp.float32))
    (dw,) = unfold(dwf)
    return dx, dw.astype(w.dtype), dbias.astype(bias.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _subpixel_chain(x, w, bias, tile_h):
    return _subpixel_fwd_impl(x, w, bias, tile_h)


def _subpixel_fwd(x, w, bias, tile_h):
    out = _subpixel_fwd_impl(x, w, bias, tile_h)
    y, _ = out
    # y is this op's own output (already in HBM): saving it is free and
    # lets the fused backward form dye = g + ds0 + 2*y*ds1 directly.
    return out, (x, w, bias, y)


def _subpixel_bwd(tile_h, residuals, g):
    x, w, bias, y = residuals
    gy, gstats = g
    use_kernel = SUBPIXEL_BACKWARD == "kernel"
    if use_kernel and not INTERPRET:
        try:
            use_kernel = jax.default_backend() == "tpu"
        except Exception:
            use_kernel = False
    if use_kernel:
        itemsize = 2 if x.dtype == jnp.bfloat16 else 4
        picked = _subpixel_bwd_pick_tile(
            x.shape[1], x.shape[2], x.shape[3], w.shape[-1], itemsize
        )
        # small-domain shapes below ~128^2 px measured FASTER on the XLA
        # VJP (0.86x at 64->128 C512 b4 vs 1.4-2.3x wins above —
        # benchmarks/subpixel_bwd_bench.py); route by pixel count.
        use_kernel = (
            picked is not None
            and x.shape[1] * x.shape[2] >= SUBPIXEL_BWD_MIN_PIXELS
        )
    if use_kernel:
        return _subpixel_bwd_impl(x, w, bias, y, gy, gstats, picked)
    _, vjp = jax.vjp(_xla_upsample_conv, x, w, bias)
    return vjp(g)


# "kernel": fused Pallas backward; "xla": restate + jax.vjp (replays the
# literal nearest-2x + conv3x3 forward and materializes the 4x tensor).
SUBPIXEL_BACKWARD = "kernel"
SUBPIXEL_BWD_MIN_PIXELS = 128 * 128

_subpixel_chain.defvjp(_subpixel_fwd, _subpixel_bwd)


def fused_upsample_conv3x3_stats(
    x: Array, w: Array, bias: Array, *, force_xla: bool = False
) -> Tuple[Array, Array]:
    """Nearest-2x upsample + conv3x3 + bias with the stats epilogue.

    On TPU (aligned shapes) runs the subpixel kernel: reads the SMALL
    tensor, 2.25x fewer FLOPs, no upsampled intermediate in HBM. Matches
    diffusers Upsample2D numerics (weight re-association only)."""
    bsz, height, width, c_in = x.shape
    n_out = w.shape[-1]
    on_tpu = False
    try:
        on_tpu = jax.default_backend() == "tpu" or INTERPRET
    except Exception:
        pass
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    picked = None
    for cand in (32, 16, 8, 4):
        if height % cand == 0 and _subpixel_vmem_bytes(
            cand, width, c_in, n_out, itemsize
        ) <= SUBPIXEL_TILE_BUDGET:
            picked = cand
            break
    aligned = (
        picked is not None
        and width % 8 == 0
        and c_in % 128 == 0
        and n_out % 128 == 0
    )
    if force_xla or not on_tpu or not aligned:
        return _xla_upsample_conv(x, w, bias)
    return _subpixel_chain(x, w, bias, picked)


def fused_conv3x3_stats(
    x: Array, kernel: Array, bias: Array, *, force_xla: bool = False
) -> Tuple[Array, Array]:
    """Bare conv3x3 + bias through the fused kernel (identity activation,
    unit coefficients) with the free (sum, sumsq) stats epilogue — used for
    the decoder Upsample conv so the NEXT block's GN1 stats pass is free."""
    bsz, _, _, c_in = x.shape
    ones = jnp.ones((bsz, c_in), jnp.float32)
    zeros = jnp.zeros((bsz, c_in), jnp.float32)
    return gn_silu_conv3x3_stats(
        x, ones, zeros, kernel, bias, activation="identity", force_xla=force_xla
    )


def fused_resnet_block(
    x: Array,
    params: dict,
    *,
    num_groups: int,
    stats: Optional[Array] = None,
    force_xla: bool = False,
) -> Tuple[Array, Array]:
    """One diffusers-layout ResnetBlock as two fused kernels.

    params: {"norm1": {scale, bias}, "conv1": {kernel, bias},
             "norm2": ..., "conv2": ..., optional "conv_shortcut": {kernel, bias}}
    stats: optional (B, 2, C_in) per-channel stats of x from the previous
    block's epilogue (saves the GN1 stats pass). Returns (out, stats(out)).
    """
    bsz, height, width, c_in = x.shape
    hw = height * width
    if stats is None:
        stats = tensor_stats(x)
    a1, b1 = stats_to_coeffs(
        stats, params["norm1"]["scale"], params["norm1"]["bias"], num_groups, hw
    )
    k1 = params["conv1"]["kernel"].astype(x.dtype)
    y1, stats1 = gn_silu_conv3x3_stats(
        x, a1, b1, k1, params["conv1"]["bias"], force_xla=force_xla
    )
    a2, b2 = stats_to_coeffs(
        stats1, params["norm2"]["scale"], params["norm2"]["bias"], num_groups, hw
    )
    k2 = params["conv2"]["kernel"].astype(x.dtype)
    if "conv_shortcut" in params:
        # 1x1 projected residual runs IN kernel 2 (4th GEMM on the x slab)
        ks = params["conv_shortcut"]["kernel"]  # (1, 1, C_in, N)
        proj = (
            ks.reshape(ks.shape[-2], ks.shape[-1]).astype(x.dtype),
            params["conv_shortcut"]["bias"],
        )
        out, stats_out = gn_silu_conv3x3_stats(
            y1, a2, b2, k2, params["conv2"]["bias"], x, proj=proj,
            force_xla=force_xla,
        )
    else:
        out, stats_out = gn_silu_conv3x3_stats(
            y1, a2, b2, k2, params["conv2"]["bias"], x, force_xla=force_xla
        )
    return out, stats_out

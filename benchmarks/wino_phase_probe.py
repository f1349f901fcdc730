#!/usr/bin/env python
"""Phase bisect of the in-VMEM Winograd kernel: where do the 29.6 ms go?

Variants (each a cut-down copy of the kernel, same DMA/grid):
  act    — DMA + activation only (writes act slab rows)
  colT   — + column transform (4 variants, fp32)
  rowT   — + row transform (16 V tensors, cast to bf16)
  gemm   — + 16 MXU GEMMs (skip output transform: sum Ms)
  full   — everything (the real kernel)
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import ragb_vae_tpu.ops.pallas.resnet_block as rb

ITERS = 10


def probe_kernel(
    x_hbm, a_ref, b_ref, u_ref, out_ref, xbuf, awide, sems, *,
    tile_h, width2, n_tiles, phase,
):
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    n_b = pl.num_programs(0)
    slot = (bi * n_tiles + hi) % 2
    t2 = tile_h // 2

    def dma(b_idx, h_idx, into_slot):
        # probe-only: clamp the slab window inside the image (numerics at the
        # boundary tiles are wrong, timing is what we're after)
        h0 = jnp.clip(h_idx * tile_h - 1, 0, n_tiles * tile_h - (tile_h + 2))
        return pltpu.make_async_copy(
            x_hbm.at[b_idx, pl.ds(h0, tile_h + 2), :, :],
            xbuf.at[into_slot, pl.ds(0, tile_h + 2), pl.ds(8, width2), :],
            sems.at[into_slot],
        )

    @pl.when(jnp.logical_and(bi == 0, hi == 0))
    def _warm():
        dma(bi, hi, slot).start()

    nxt = bi * n_tiles + hi + 1

    @pl.when(nxt < n_b * n_tiles)
    def _prefetch():
        dma(nxt // n_tiles, nxt % n_tiles, (slot + 1) % 2).start()

    dma(bi, hi, slot).wait()

    c2 = xbuf.shape[-1]
    c = c2 // 2
    n_out = u_ref.shape[-1]

    raw = xbuf[slot].astype(jnp.float32)
    act = raw * a_ref[0, 0][None, None, :] + b_ref[0, 0][None, None, :]
    act = act * jax.nn.sigmoid(act)
    awide[:] = act.astype(awide.dtype)

    if phase == "act":
        out_ref[0] = awide[1 : tile_h + 1, 8 : 8 + width2, :].astype(out_ref.dtype)
        return

    d_m1 = awide[:, 7 : 7 + width2, c:].astype(jnp.float32)
    d_0 = awide[:, 8 : 8 + width2, :c].astype(jnp.float32)
    d_p1 = awide[:, 8 : 8 + width2, c:].astype(jnp.float32)
    d_p2 = awide[:, 9 : 9 + width2, :c].astype(jnp.float32)
    cv = (d_m1 - d_p1, d_0 + d_p1, d_p1 - d_0, d_0 - d_p2)

    if phase == "colT":
        s = sum(v[1 : tile_h + 1] for v in cv)
        out_ref[0] = jnp.concatenate([s, s], axis=-1).astype(out_ref.dtype)
        return

    vs = []
    for nu in range(4):
        v = cv[nu].reshape(t2 + 1, 2, width2, c)
        ev, od = v[:, 0], v[:, 1]
        vs.append((
            (ev[0:t2] - ev[1 : t2 + 1]).astype(awide.dtype),
            (od[0:t2] + ev[1 : t2 + 1]).astype(awide.dtype),
            (ev[1 : t2 + 1] - od[0:t2]).astype(awide.dtype),
            (od[0:t2] - od[1 : t2 + 1]).astype(awide.dtype),
        ))

    if phase == "rowT":
        s = sum(vs[nu][xi].astype(jnp.float32) for nu in range(4) for xi in range(4))
        s2 = jnp.concatenate([s, s], axis=-1)
        out_ref[0] = jnp.concatenate([s2, s2], axis=0).reshape(
            tile_h, width2, 2 * c
        ).astype(out_ref.dtype)[:, :, : out_ref.shape[-1]]
        return

    m_acc = [[None] * 4 for _ in range(4)]
    for nu in range(4):
        for xi in range(4):
            m_acc[xi][nu] = jax.lax.dot_general(
                vs[nu][xi].reshape(t2 * width2, c),
                u_ref[xi, nu],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    if phase == "gemm":
        s = functools.reduce(
            lambda a_, b_: a_ + b_, [m_acc[x][y] for x in range(4) for y in range(4)]
        )
        s2 = jnp.concatenate([s, s], axis=-1).reshape(t2, width2, 2 * n_out)
        out_ref[0] = jnp.concatenate([s2, s2], axis=0).reshape(
            tile_h, width2, 2 * n_out
        ).astype(out_ref.dtype)
        return

    z = [
        [m_acc[0][nu] + m_acc[1][nu] + m_acc[2][nu] for nu in range(4)],
        [m_acc[1][nu] - m_acc[2][nu] - m_acc[3][nu] for nu in range(4)],
    ]
    rows = []
    for p in range(2):
        yq0 = z[p][0] + z[p][1] + z[p][2]
        yq1 = z[p][1] - z[p][2] - z[p][3]
        rows.append(jnp.concatenate([yq0, yq1], axis=-1).reshape(t2, width2, 2 * n_out))
    y = jnp.stack(rows, axis=1).reshape(tile_h, width2, 2 * n_out)
    out_ref[0] = y.astype(out_ref.dtype)


def run(phase, x6, a2, b2, u, tile_h, n_out):
    bsz, height, w2, c2 = x6.shape
    kernel = functools.partial(
        probe_kernel, tile_h=tile_h, width2=w2, n_tiles=height // tile_h, phase=phase
    )
    out_c = c2 if phase in ("act", "colT", "rowT") else 2 * n_out
    if phase == "rowT":
        out_c = c2
    return pl.pallas_call(
        kernel,
        grid=(bsz, height // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, c2), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (4, 4, c2 // 2, n_out), lambda bi, hi: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w2, out_c), lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, height, w2, out_c), x6.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, w2 + 16, c2), x6.dtype),
            pltpu.VMEM((tile_h + 2, w2 + 16, c2), x6.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
    )(x6, a2, b2, u)


def main() -> None:
    rng = np.random.default_rng(0)
    h = w = 1024
    c = n = 128
    bsz = 4
    tile_h = 8
    x = jnp.asarray(rng.standard_normal((bsz, h, w, c)), jnp.bfloat16)
    x6 = x.reshape(bsz, h, w // 2, 2 * c)
    a2 = jnp.asarray(np.tile(rng.standard_normal((bsz, 1, c)) * 0.3 + 1.0, (1, 1, 2)), jnp.float32)
    b2 = jnp.asarray(np.tile(rng.standard_normal((bsz, 1, c)) * 0.1, (1, 1, 2)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((4, 4, c, n)) * 0.05, jnp.bfloat16)

    for phase in ("act", "colT", "rowT", "gemm", "full"):
        fn = jax.jit(functools.partial(run, phase, tile_h=tile_h, n_out=n))
        try:
            sink = jax.jit(
                lambda *a: jnp.sum(run(phase, *a, tile_h=tile_h, n_out=n).astype(jnp.float32))
            )
            float(sink(x6, a2, b2, u))
            t0 = time.perf_counter()
            for _ in range(ITERS):
                float(sink(x6, a2, b2, u))
            t = (time.perf_counter() - t0) / ITERS
            print(f"phase {phase:5s}: {t*1e3:7.3f} ms")
        except Exception as e:
            print(f"phase {phase:5s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()

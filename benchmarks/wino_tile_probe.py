#!/usr/bin/env python
"""Tile-size sensitivity of the in-VMEM Winograd kernel (spill pressure
scales with tile_h: the 16 fp32 M accumulators + 4 fp32 cv tensors are
SSA values Mosaic must place)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import ragb_vae_tpu.ops.pallas.resnet_block as rb

ITERS = 10


def timed(fn, *args, iters=ITERS):
    @jax.jit
    def chain(*a):
        def body(i, carry):
            out, _ = fn(*((carry,) + a[1:]))
            return carry * 0.9999 + out * 1e-6

        return lax.fori_loop(0, iters, body, a[0] * 1.0)

    float(jnp.sum(chain(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    rng = np.random.default_rng(0)
    for h, w, c, n in [(1024, 1024, 128, 128), (512, 512, 256, 256)]:
        bsz = 4
        x = jnp.asarray(rng.standard_normal((bsz, h, w, c)), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal((bsz, c)) * 0.3 + 1.0, jnp.float32)
        b = jnp.asarray(rng.standard_normal((bsz, c)) * 0.1, jnp.float32)
        wk = jnp.asarray(rng.standard_normal((3, 3, c, n)) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(n) * 0.1, jnp.float32)
        flops = 2 * 9 * bsz * h * w * c * n
        for tile in (2, 4, 8, 16):
            if h % tile:
                continue

            def wino(x, a, b, wk, bias, _t=tile):
                return rb._wino_chain(x, a, b, wk, bias, None, None, None, _t, "silu")

            try:
                t = timed(wino, x, a, b, wk, bias)
                print(
                    f"{h}x{w}x{c}->{n} b{bsz} tile {tile:2d}: {t*1e3:7.3f} ms "
                    f"({flops/t/1e12:6.1f} TF/s direct-equiv)"
                )
            except Exception as e:
                print(f"{h}x{w}x{c}->{n} b{bsz} tile {tile:2d}: FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()

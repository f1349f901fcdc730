#!/usr/bin/env python
"""(a) Fused-model encode/decode split at b8 (seam accounting); (b) the
encoder Downsample conv3x3-stride2 vs a space-to-depth reformulation
(s2d reshape + dense 2x2-window conv, 1.78x FLOPs but all-dense GEMMs)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

ITERS = 8


def timed(fn, *args):
    @jax.jit
    def chain(*a):
        def body(i, c):
            out = fn(c, *a[1:])
            return c + jnp.mean(out).astype(c.dtype) * 1e-6

        return lax.fori_loop(0, ITERS, body, a[0])

    float(jnp.sum(chain(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS


def split_bench() -> None:
    from ragb_vae_tpu.models.rgba_vae import RgbaVAE
    from ragb_vae_tpu.models.vae_config import AutoencoderConfig

    cfg = AutoencoderConfig.flux()
    cfg.in_channels = 4
    cfg.out_channels = 4
    m = RgbaVAE(config=cfg, dtype=jnp.bfloat16, fused=True)
    params = jax.device_put(
        m.init_params(jax.random.PRNGKey(0), image_size=64), jax.devices()[0]
    )
    rng = np.random.default_rng(0)
    bsz = 8
    x = jnp.asarray(rng.random((bsz, 1024, 1024, 4)), jnp.float32)
    z = jnp.asarray(rng.random((bsz, 128, 128, 16)), jnp.bfloat16)

    def enc(c, p):
        # carry is x-shaped; encode and splat a scalar back
        post = m.encode(p, c)
        return jnp.zeros_like(c) + jnp.mean(post.mean.astype(jnp.float32)).astype(c.dtype)

    def dec(c, p):
        out = m.decode(p, c)
        return jnp.zeros_like(c) + jnp.mean(out.astype(jnp.float32)).astype(c.dtype)

    te = timed(enc, x, params) / bsz
    td = timed(dec, z, params) / bsz
    print(f"b8 fused: encode {te*1e3:7.2f}ms/img decode {td*1e3:7.2f}ms/img", flush=True)


def downsample_probe() -> None:
    rng = np.random.default_rng(1)
    for h, c in ((1024, 128), (512, 256), (256, 512)):
        x = jnp.asarray(rng.standard_normal((8, h, h, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)

        def stride2(c_, w_):
            return lax.conv_general_dilated(
                c_, w_, (2, 2), ((0, 1), (0, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        # s2d: x -> (B, H/2, W/2, 4C); 2x2 dense conv with re-associated
        # weights (taps landing in the same source cell sum; taps reading
        # across the cell boundary use the neighbor's parity channels)
        w4 = np.zeros((2, 2, 4 * c, c), np.float32)
        wn = np.asarray(w, np.float32)
        # output(r,c) = sum_{u,v} W[u,v] x[2r+u, 2c+v]
        # s2d channel block (a, b) holds x[2r'+a, 2c'+b]
        for u in range(3):
            for v in range(3):
                rp, a = divmod(u, 2)
                cp, b = divmod(v, 2)
                w4[rp, cp, (a * 2 + b) * c : (a * 2 + b + 1) * c, :] += wn[u, v]
        w4 = jnp.asarray(w4, jnp.bfloat16)

        def s2d(c_, w4_):
            b, hh, ww, cc = c_.shape
            y = c_.reshape(b, hh // 2, 2, ww // 2, 2, cc)
            y = jnp.moveaxis(y, (2, 4), (3, 4)).reshape(b, hh // 2, ww // 2, 4 * cc)
            return lax.conv_general_dilated(
                y, w4_, (1, 1), ((0, 1), (0, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        # parity check once
        a1 = stride2(x[:1], w)
        a2 = s2d(x[:1], w4)
        err = float(jnp.max(jnp.abs(a1.astype(jnp.float32) - a2.astype(jnp.float32))))
        def pad_back(y, ref):
            return jnp.pad(
                y, ((0, 0), (0, ref.shape[1] // 2), (0, ref.shape[2] // 2), (0, 0))
            )

        t1 = timed(lambda c_, w_: pad_back(stride2(c_, w_), c_), x, w)
        t2 = timed(lambda c_, w_: pad_back(s2d(c_, w_), c_), x, w4)
        print(
            f"{h}x{h}x{c}: stride2 {t1*1e3:7.2f}ms | s2d+2x2 {t2*1e3:7.2f}ms | max-err {err:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    split_bench()
    downsample_probe()

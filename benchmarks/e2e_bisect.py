#!/usr/bin/env python
"""Bisect the fused-vs-sliced e2e gap: encode / decode measured separately,
fused kernels vs per-sample-sliced XLA, at 1024^2 b4/b1."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.vae_config import AutoencoderConfig

ITERS = 8
SIZE = 1024


def build(fused: bool) -> RgbaVAE:
    config = AutoencoderConfig.flux()
    config.in_channels = 4
    config.out_channels = 4
    m = RgbaVAE(config=config, dtype=jnp.bfloat16, fused=fused)
    if not fused:
        m.enable_slicing()
    return m


def timed(fn, *args):
    @jax.jit
    def chain(*a):
        def body(i, carry):
            out = fn(*((a[0], carry) + a[2:]))
            return carry + jnp.mean(out).astype(carry.dtype) * 1e-6

        return lax.fori_loop(0, ITERS, body, a[1])

    float(jnp.sum(chain(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    plain = build(False)
    fused = build(True)
    params = plain.init_params(jax.random.PRNGKey(0), image_size=64)
    params = jax.device_put(params, jax.devices()[0])

    rng = np.random.default_rng(0)
    for bsz in (4, 1):
        x = jnp.asarray(rng.random((bsz, SIZE, SIZE, 4)), jnp.float32)
        z = jnp.asarray(rng.random((bsz, SIZE // 8, SIZE // 8, 16)), jnp.bfloat16)

        def enc(p, v, m):
            return m.encode(p, v).mean.astype(jnp.float32)

        def dec(p, v, m):
            return m.decode(p, v).astype(jnp.float32)

        for label, m in (("sliced", plain), ("fused", fused)):
            te = timed(lambda p, v: enc(p, v, m), params, x) / bsz
            td = timed(lambda p, v: dec(p, v, m), params, z) / bsz
            print(
                f"b{bsz} {label}: encode {te*1e3:7.2f}ms/img decode {td*1e3:7.2f}ms/img",
                flush=True,
            )


if __name__ == "__main__":
    main()

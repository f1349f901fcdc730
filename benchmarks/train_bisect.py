#!/usr/bin/env python
"""Bisect the fused RGBA-VAE training step at the 512^2 b4 accum-2
operating point: grad-time of encode / decode / LPIPS / full loss,
to locate the next kernel-engineering target after the fused chain +
subpixel backwards."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

SIZE = 512
BATCH = 2  # one accum microbatch of the b4 accum-2 point
ITERS = 6


def timed(fn, *args):
    @jax.jit
    def chain(*a):
        def body(i, c):
            out = fn(c, *a[1:])
            return c + out.astype(c.dtype) * 1e-9

        return lax.fori_loop(0, ITERS, body, a[0] * 1.0)

    float(jnp.sum(chain(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    float(jnp.sum(chain(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    import tempfile

    from ragb_vae_tpu.models.lpips import maybe_build_lpips
    from ragb_vae_tpu.models.rgba_vae import RgbaVAE
    from ragb_vae_tpu.models.vae_config import AutoencoderConfig
    from ragb_vae_tpu.models.weights import save_torch_state
    from tests.torch_lpips_ref import make_lpips_state

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    tmp = Path(tempfile.mkdtemp()) / "lpips_vgg.safetensors"
    save_torch_state(make_lpips_state(seed=0), tmp)
    lpips_fn = maybe_build_lpips(tmp)

    config = AutoencoderConfig.flux()
    config.in_channels = 4
    config.out_channels = 4
    model = RgbaVAE(config=config, dtype=jnp.bfloat16, remat=True)
    model.enable_fused()
    params = model.init_params(jax.random.PRNGKey(0), image_size=64)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, SIZE, SIZE, 4)), jnp.bfloat16)
    z = jnp.asarray(
        rng.standard_normal((BATCH, SIZE // 8, SIZE // 8, 16)), jnp.bfloat16
    )
    key = jax.random.PRNGKey(1)

    def enc_grad(x_, params):
        def loss(p):
            post = model.encode(p, x_)
            return jnp.mean(jnp.square(post.params.astype(jnp.float32)))
        return jax.grad(loss)(params)["encoder"]["conv_in"]["kernel"].astype(
            jnp.float32
        ).sum()

    def dec_grad(z_, params):
        def loss(p):
            y = model.decode(p, z_)
            return jnp.mean(jnp.square(y.astype(jnp.float32)))
        return jax.grad(loss)(params)["decoder"]["conv_in"]["kernel"].astype(
            jnp.float32
        ).sum()

    def lpips_grad(x_, params):
        def loss(p):
            y = model.decode(p, z)
            return jnp.mean(lpips_fn(y, x_))
        return jax.grad(loss)(params)["decoder"]["conv_in"]["kernel"].astype(
            jnp.float32
        ).sum()

    def dec_mse_grad(x_, params):
        def loss(p):
            y = model.decode(p, z)
            return jnp.mean(jnp.square(y.astype(jnp.float32) - x_.astype(jnp.float32)))
        return jax.grad(loss)(params)["decoder"]["conv_in"]["kernel"].astype(
            jnp.float32
        ).sum()

    for name, fn, arg in (
        ("encode grad", enc_grad, x),
        ("decode(mse) grad", dec_mse_grad, x),
        ("decode+LPIPS grad", lpips_grad, x),
    ):
        t = timed(fn, arg, params)
        print(f"{name:>20}: {t*1e3:8.2f} ms (b{BATCH} {SIZE}px)", flush=True)


if __name__ == "__main__":
    main()

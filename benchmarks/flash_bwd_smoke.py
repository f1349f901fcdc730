#!/usr/bin/env python
"""Staged Mosaic-lowering smoke for the fused flash-attention backward:
compile + run each kernel on the real chip at a small shape before the
full-size bench (the full bench's first compile hung once; this isolates
which stage is responsible)."""
from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import ragb_vae_tpu.ops.pallas.flash_attention as pa


def main() -> None:
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    bh, seq, d = 2, 1024, 128
    q = jnp.asarray(rng.standard_normal((bh, seq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((bh, seq, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((bh, seq, d)), jnp.bfloat16)
    scale = 1.0 / math.sqrt(d)

    t0 = time.time()
    out, lse = jax.jit(
        lambda q, k, v: pa._flash_fwd_impl(q, k, v, sm_scale=scale, block_q=512, block_k=512)
    )(q, k, v)
    out.block_until_ready()
    print(f"fwd+lse ok in {time.time()-t0:.1f}s; lse[0,:3]={np.asarray(lse[0,:3,0])}", flush=True)

    t0 = time.time()
    g = jnp.ones_like(q)
    dq, dk, dv = jax.jit(
        lambda q, k, v, out, lse, g: pa.flash_attention_bwd_3d(
            q, k, v, out, lse, g, sm_scale=scale, block_q=512, block_k=512
        )
    )(q, k, v, out, lse, g)
    dq.block_until_ready()
    print(f"bwd kernels ok in {time.time()-t0:.1f}s", flush=True)

    # parity vs XLA chunked VJP on-chip
    _, vjp = jax.vjp(lambda a, b, c: pa.chunked_attention_3d(a, b, c, sm_scale=scale), q, k, v)
    rq, rk, rv = vjp(g)
    for name, ours, ref in (("dq", dq, rq), ("dk", dk, rk), ("dv", dv, rv)):
        diff = float(jnp.max(jnp.abs(ours.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"{name} max|diff| vs XLA: {diff:.4f}", flush=True)

    # full grad through the custom VJP in one jit
    t0 = time.time()
    grads = jax.jit(
        jax.grad(
            lambda q, k, v: jnp.sum(
                pa._flash_attention_3d(q, k, v, scale, 512, 512).astype(jnp.float32)
            ),
            argnums=(0, 1, 2),
        )
    )(q, k, v)
    grads[0].block_until_ready()
    print(f"custom-vjp grad ok in {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()

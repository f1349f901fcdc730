#!/usr/bin/env python
"""Fused flash-attention backward vs round-1 recompute VJP, hot shapes.

Shapes: the Flux DiT self-attention at 1024^2 in-context conditioning
(24 heads x 128 dim, ~4.6k tokens) and the VAE mid-block (1 head x 512
dim, 16k tokens). Measures a full value_and_grad step over the attention
call alone, chained in-graph to amortize the tunnel RPC.
"""
from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import ragb_vae_tpu.ops.pallas.flash_attention as pa

SHAPES = [  # (label, bh, seq, d)
    ("flux-dit 24hx128d s4608", 24, 4608, 128),
    ("vae-mid 1hx512d s16384", 1, 16384, 512),
]
ITERS = 10


def timed(grad_fn, q, k, v):
    @jax.jit
    def chain(q, k, v):
        def body(i, carry):
            dq, dk, dv = grad_fn(carry, k, v)
            return carry + dq.astype(carry.dtype) * 1e-6

        return lax.fori_loop(0, ITERS, body, q)

    float(jnp.sum(chain(q, k, v).astype(jnp.float32)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(chain(q, k, v).astype(jnp.float32)))
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    print(f"device: {jax.devices()[0].device_kind}")
    for label, bh, seq, d in SHAPES:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((bh, seq, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((bh, seq, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((bh, seq, d)), jnp.bfloat16)
        scale = 1.0 / math.sqrt(d)
        bq = min(pa.DEFAULT_BLOCK_Q, seq)
        bk = min(pa.DEFAULT_BLOCK_K, seq)

        import functools

        # round-1 path restated: flash fwd + chunked-XLA recompute bwd
        @functools.partial(jax.custom_vjp, nondiff_argnums=())
        def attn_recompute(q, k, v):
            return pa.flash_attention_fwd_3d(q, k, v, sm_scale=scale, block_q=bq, block_k=bk)

        def _re_fwd(q, k, v):
            return attn_recompute(q, k, v), (q, k, v)

        def _re_bwd(res, g):
            q, k, v = res
            _, vjp = jax.vjp(
                lambda q_, k_, v_: pa.chunked_attention_3d(q_, k_, v_, sm_scale=scale),
                q, k, v,
            )
            return vjp(g)

        attn_recompute.defvjp(_re_fwd, _re_bwd)

        def loss_fused(q, k, v):
            return jnp.sum(pa._flash_attention_3d(q, k, v, scale, bq, bk).astype(jnp.float32))

        def loss_recompute(q, k, v):
            return jnp.sum(attn_recompute(q, k, v).astype(jnp.float32))

        fused = jax.grad(loss_fused, argnums=(0, 1, 2))
        recomp = jax.grad(loss_recompute, argnums=(0, 1, 2))
        # total flops for fwd+bwd ~ 2.5x the 4*bh*s^2*d forward
        flops = 10 * bh * seq * seq * d
        t_f = timed(lambda q, k, v: fused(q, k, v), q, k, v)
        t_r = timed(lambda q, k, v: recomp(q, k, v), q, k, v)
        print(
            f"{label}: fused fwd+bwd {t_f*1e3:7.2f}ms ({flops/t_f/1e12:5.1f}TF/s) | "
            f"recompute fwd+bwd {t_r*1e3:7.2f}ms ({flops/t_r/1e12:5.1f}TF/s)"
        )


if __name__ == "__main__":
    main()

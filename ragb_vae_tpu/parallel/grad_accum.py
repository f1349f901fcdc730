"""Gradient accumulation as a jittable scan over microbatches.

Replaces `accelerator.accumulate(model)` (reference rgba_vae_stage.py:265,434;
flux_kontext_textalpha_lora.py:126,294): instead of N Python-side forward/
backward passes with a no-sync context, the microbatch loop is a
`lax.scan` inside one compiled step — gradients accumulate in-register/HBM
and the cross-chip reduction happens once, after the scan.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

PyTree = Any


def split_microbatches(batch: PyTree, num_micro: int) -> PyTree:
    """Reshape every (B, ...) leaf to (num_micro, B//num_micro, ...)."""
    def reshape(leaf):
        b = leaf.shape[0]
        if b % num_micro != 0:
            raise ValueError(f"Batch {b} not divisible by {num_micro} microbatches.")
        return leaf.reshape((num_micro, b // num_micro) + leaf.shape[1:])

    return jax.tree_util.tree_map(reshape, batch)


def accumulated_grads(
    loss_fn: Callable[[PyTree, PyTree, jax.Array], Tuple[jax.Array, PyTree]],
    params: PyTree,
    batch: PyTree,
    key: jax.Array,
    num_micro: int,
    micro_weight_fn: Callable[[PyTree], jax.Array] = None,
) -> Tuple[jax.Array, PyTree, PyTree]:
    """Mean loss/grads/aux over `num_micro` microbatches.

    `loss_fn(params, microbatch, key) -> (loss, aux)` with scalar loss and
    scalar-leaf aux. Returns (loss, aux, grads), all microbatch means.

    `micro_weight_fn(microbatch) -> scalar` weights each microbatch's
    contribution (e.g. its real-sample weight sum). Without it, every
    microbatch gets equal weight — which deflates/biases the result when
    per-sample weights differ across microbatches: a loss_fn computing a
    weighted MEAN per microbatch (sum(w*l)/sum(w)) averaged uniformly is
    NOT the global weighted mean once padding rows (w=0) concentrate in
    one microbatch (an all-padding microbatch would contribute a spurious
    zero term). With W_mb = sum(w) per microbatch, sum(W_mb * mean_mb) /
    sum(W_mb) is exactly the unpadded global mean, restoring the
    pad-invariance contract for grads as well as the loss.
    """
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    if num_micro <= 1:
        (loss, aux), grads = grad_fn(params, batch, key)
        return loss, aux, grads

    micro = split_microbatches(batch, num_micro)
    keys = jax.random.split(key, num_micro)

    def body(carry, xs):
        acc_loss, acc_aux, acc_grads, acc_w = carry
        mb, k = xs
        (loss, aux), grads = grad_fn(params, mb, k)
        w = (
            micro_weight_fn(mb).astype(jnp.float32)
            if micro_weight_fn is not None
            else jnp.float32(1.0)
        )
        wmul = lambda t: jax.tree_util.tree_map(lambda x: x * w.astype(x.dtype), t)
        acc = (
            acc_loss + w * loss,
            jax.tree_util.tree_map(jnp.add, acc_aux, wmul(aux)),
            jax.tree_util.tree_map(jnp.add, acc_grads, wmul(grads)),
            acc_w + w,
        )
        return acc, None

    # Zero-init carry and scan over ALL microbatches. Peeling the first
    # microbatch out of the scan (the previous design) duplicates the
    # entire fwd+bwd graph in the program — XLA does not share buffers
    # between the peeled call and the scan body, which cost ~2.3 GB of
    # HLO temps at 1024^2 and OOM'd effective-b2 on 16 GB. The zeros
    # init is one memset over the grads tree (~params size), free.
    first_mb = jax.tree_util.tree_map(lambda x: x[0], micro)
    (loss_sh, aux_sh), grads_sh = jax.eval_shape(grad_fn, params, first_mb, keys[0])
    zeros = lambda tree: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), tree
    )
    init = (zeros(loss_sh), zeros(aux_sh), zeros(grads_sh), jnp.float32(0.0))
    (loss, aux, grads, total_w), _ = jax.lax.scan(body, init, (micro, keys))

    inv = 1.0 / jnp.maximum(total_w, 1e-8)
    scale = lambda t: jax.tree_util.tree_map(lambda x: x * inv.astype(x.dtype), t)
    return loss * inv, scale(aux), scale(grads)

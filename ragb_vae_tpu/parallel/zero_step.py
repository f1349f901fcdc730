"""Explicit-collective ZeRO-2 training step (shard_map).

The GSPMD path (`zero_sharding` + jit annotations) lets XLA choose the
collectives. This module is the DETERMINISTIC alternative: the literal
DeepSpeed ZeRO-2 dataflow (reference configs/deepspeed_zero2.json —
gradient partitioning + optimizer-state partitioning, parameters
replicated) written as one `jax.shard_map` over the data axis with the
collectives spelled out:

  1. every device computes gradients on ITS batch shard (params replicated)
  2. `lax.psum_scatter` reduces each flattened gradient leaf AND leaves
     each device holding only its 1/N slice (DeepSpeed's reduce-scatter
     bucket, without the bucketing: XLA fuses the leaf scatters)
  3. gradient clipping by GLOBAL norm: local sum-of-squares + `lax.psum`
  4. AdamW runs on the LOCAL shard only — optimizer state is born,
     lives, and updates as (n_devices, leaf_size/n) arrays, 1/N per chip
  5. `lax.all_gather` rebuilds the full updated parameters on every chip

Numerics are exactly the replicated step's (Adam is elementwise; the
clip norm is computed globally), verified in tests/test_zero_step.py.

Why keep both: GSPMD needs no code for new optimizers but its layout
choices are opaque; this step IS the layout — useful when the sharding
must be auditable (e.g. comparing against a DeepSpeed run step-by-step)
and as the template for collectives the GSPMD path cannot express.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ragb_vae_tpu.parallel.mesh import DATA_AXIS

PyTree = Any


def _flatten_pad(leaf: jnp.ndarray, n: int) -> jnp.ndarray:
    """Leaf -> 1-D, zero-padded to a multiple of n."""
    flat = leaf.reshape(-1)
    pad = (-flat.shape[0]) % n
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat


def _unflatten(flat: jnp.ndarray, shape, dtype) -> jnp.ndarray:
    size = int(np.prod(shape)) if shape else 1
    return flat[:size].reshape(shape).astype(dtype)


def zero2_optimizer(
    learning_rate: float,
    *,
    betas: Tuple[float, float] = (0.5, 0.9),
    weight_decay: float = 0.01,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """The elementwise part of the update (AdamW). Clipping is handled by
    the step itself (it needs a cross-device psum)."""
    return optax.adamw(
        learning_rate, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay
    )


def init_zero2_state(params: PyTree, tx: optax.GradientTransformation, mesh: Mesh):
    """Optimizer state over (n, size/n)-shaped flat leaves, sharded on the
    data axis — each chip materializes only its slice (ZeRO-2 residency)."""
    n = mesh.shape[DATA_AXIS]
    flat_shards = jax.tree_util.tree_map(
        lambda p: _flatten_pad(p, n).reshape(n, -1), params
    )
    shard = NamedSharding(mesh, P(DATA_AXIS))

    def init(fs):
        return tx.init(fs)

    shardings = jax.tree_util.tree_map(
        lambda leaf: shard if getattr(leaf, "ndim", 0) >= 1 else NamedSharding(mesh, P()),
        jax.eval_shape(init, flat_shards),
    )
    return jax.jit(init, out_shardings=shardings)(flat_shards)


def make_zero2_train_step(
    loss_fn: Callable[[PyTree, Dict[str, jnp.ndarray], jax.Array], Tuple[jnp.ndarray, Dict]],
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    max_grad_norm: Optional[float] = None,
    donate: bool = True,
):
    """Build `step(params, opt_state, batch, key) -> (params, opt_state, metrics)`.

    `loss_fn(params, local_batch, key) -> (loss, metrics)` sees the
    PER-DEVICE batch shard (leading dim B/n) and must reduce with means.
    `params` are replicated; `opt_state` from `init_zero2_state`; `batch`
    leaves sharded on the data axis (leading dim divisible by n).
    """
    n = mesh.shape[DATA_AXIS]

    def _step(params, opt_state, batch, key):
        rank = lax.axis_index(DATA_AXIS)
        local_key = jax.random.fold_in(key, rank)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, local_key
        )

        # Per-device weighting: loss_fn reduces its LOCAL shard with a
        # weighted mean, and uniformly averaging those means across devices
        # (psum/n) deflates and biases the gradient whenever per-device
        # real-sample weights differ — a device holding only padding rows
        # (w=0) would contribute a spurious zero term. Weighting each
        # device's mean by its local weight sum and dividing by the GLOBAL
        # weight sum reproduces the unpadded global mean exactly, matching
        # the GSPMD path's numerics.
        if isinstance(batch, dict) and "weights" in batch:
            w_local = jnp.sum(batch["weights"]).astype(jnp.float32)
        else:
            w_local = jnp.float32(1.0)
        w_global = jnp.maximum(lax.psum(w_local, DATA_AXIS), 1e-8)

        # 2. reduce-scatter: flatten each leaf, every chip keeps slice #rank
        def scatter(g):
            flat = _flatten_pad(g.astype(jnp.float32) * w_local, n)
            return lax.psum_scatter(flat, DATA_AXIS, tiled=True) / w_global

        grad_shards = jax.tree_util.tree_map(scatter, grads)

        # 3. clip by GLOBAL grad norm (sumsq of the scattered shards psum'd
        # across chips is exactly the full-gradient norm — shards partition it)
        local_sq = sum(
            jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grad_shards)
        )
        gnorm = jnp.sqrt(lax.psum(local_sq, DATA_AXIS))
        if max_grad_norm is not None:
            scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(gnorm, 1e-12))
            grad_shards = jax.tree_util.tree_map(lambda g: g * scale, grad_shards)

        # 4. the optimizer sees only the local (1/n) param/grad slice
        def local_slice(p):
            flat = _flatten_pad(p, n)
            k = flat.shape[0] // n
            return lax.dynamic_slice(flat, (rank * k,), (k,)).astype(jnp.float32)

        param_shards = jax.tree_util.tree_map(local_slice, params)
        # opt_state leaves carry a leading (1,)-sharded dim; drop it locally
        local_opt = jax.tree_util.tree_map(
            lambda leaf: leaf[0] if getattr(leaf, "ndim", 0) >= 1 else leaf, opt_state
        )
        updates, new_local_opt = tx.update(grad_shards, local_opt, param_shards)
        new_param_shards = optax.apply_updates(param_shards, updates)

        # 5. all-gather the updated slices back into full parameters
        def gather(shard, ref):
            full = lax.all_gather(shard, DATA_AXIS, tiled=True)
            return _unflatten(full, ref.shape, ref.dtype)

        new_params = jax.tree_util.tree_map(gather, new_param_shards, params)
        new_opt = jax.tree_util.tree_map(
            lambda leaf: leaf[None] if getattr(leaf, "ndim", 0) >= 1 else leaf,
            new_local_opt,
        )

        metrics = dict(metrics)
        metrics["train/loss"] = loss
        # out_spec declares metrics replicated (P()): reduce EVERY array
        # leaf with the same weighted mean as the gradient — a device-local
        # leaf under check_vma=False would otherwise silently ship one
        # device's values as if they were the global reduction.
        metrics = jax.tree_util.tree_map(
            lambda m: lax.psum(m * w_local.astype(m.dtype), DATA_AXIS) / w_global
            if hasattr(m, "ndim") else m,
            metrics,
        )
        metrics["train/grad_norm"] = gnorm
        return new_params, new_opt, metrics

    rep = P()
    shard = P(DATA_AXIS)

    def opt_spec(leaf):
        return shard if getattr(leaf, "ndim", 0) >= 1 else rep

    def build(params, opt_state, batch, key):
        opt_specs = jax.tree_util.tree_map(opt_spec, opt_state)
        batch_specs = jax.tree_util.tree_map(lambda _: shard, batch)
        fn = jax.shard_map(
            _step,
            mesh=mesh,
            in_specs=(rep, opt_specs, batch_specs, rep),
            out_specs=(rep, opt_specs, rep),
            check_vma=False,
        )
        return fn(params, opt_state, batch, key)

    return jax.jit(build, donate_argnums=(0, 1) if donate else ())


__all__ = ["init_zero2_state", "make_zero2_train_step", "zero2_optimizer"]

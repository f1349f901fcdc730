"""Explicit-collective ZeRO-2 step == replicated optax step, bit-for-bit
semantics (8-device CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ragb_vae_tpu.parallel import create_mesh
from ragb_vae_tpu.parallel.zero_step import (
    init_zero2_state,
    make_zero2_train_step,
    zero2_optimizer,
)


def _params():
    rng = np.random.default_rng(0)
    return {
        "w": jnp.asarray(rng.standard_normal((16, 24)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((24,)), jnp.float32),
        "scale": jnp.asarray(rng.standard_normal(()), jnp.float32),
    }


def _loss_fn(params, batch, key):
    del key
    x, y = batch["x"], batch["y"]
    pred = x @ params["w"] + params["b"] + params["scale"]
    loss = jnp.mean((pred - y) ** 2)
    return loss, {"train/mse": loss}


def _batch(n=16):
    rng = np.random.default_rng(1)
    return {
        "x": jnp.asarray(rng.standard_normal((n, 16)), jnp.float32),
        "y": jnp.asarray(rng.standard_normal((n, 24)), jnp.float32),
    }


@pytest.mark.parametrize("max_grad_norm", [None, 0.05])
def test_zero2_matches_replicated(max_grad_norm):
    mesh = create_mesh()
    assert mesh.devices.size == 8
    params = _params()
    tx = zero2_optimizer(1e-2)
    opt_state = init_zero2_state(params, tx, mesh)
    step = make_zero2_train_step(
        _loss_fn, tx, mesh, max_grad_norm=max_grad_norm, donate=False
    )
    batch = _batch()

    # reference: plain replicated step with the same clip + AdamW
    parts = []
    if max_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    parts.append(zero2_optimizer(1e-2))
    ref_tx = optax.chain(*parts)
    ref_opt = ref_tx.init(params)

    p_z, o_z, metrics = step(params, opt_state, batch, jax.random.PRNGKey(0))

    (loss, _), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
        params, batch, jax.random.PRNGKey(0)
    )
    updates, ref_opt = ref_tx.update(grads, ref_opt, params)
    p_ref = optax.apply_updates(params, updates)

    for key in params:
        np.testing.assert_allclose(
            np.asarray(p_z[key]), np.asarray(p_ref[key]), rtol=1e-5, atol=1e-6
        )
    np.testing.assert_allclose(float(metrics["train/loss"]), float(loss), rtol=1e-5)
    gnorm = float(optax.global_norm(grads))
    np.testing.assert_allclose(float(metrics["train/grad_norm"]), gnorm, rtol=1e-5)


def test_zero2_state_is_sharded_and_steps_compose():
    mesh = create_mesh()
    params = _params()
    tx = zero2_optimizer(1e-2)
    opt_state = init_zero2_state(params, tx, mesh)
    # the big moment leaves live as (n, size/n) with the leading dim sharded
    leaves = [
        leaf for leaf in jax.tree_util.tree_leaves(opt_state)
        if getattr(leaf, "ndim", 0) >= 1
    ]
    assert leaves and all(leaf.shape[0] == 8 for leaf in leaves)
    step = make_zero2_train_step(_loss_fn, tx, mesh, max_grad_norm=1.0, donate=False)
    batch = _batch()
    p, o, m1 = step(params, opt_state, batch, jax.random.PRNGKey(0))
    p, o, m2 = step(p, o, batch, jax.random.PRNGKey(1))
    assert float(m2["train/loss"]) < float(m1["train/loss"])


def test_zero2_step_pad_invariance():
    """Devices holding only padding rows (w=0) must not deflate the
    global weighted mean — the shard_map step must match the unpadded
    result exactly (VERDICT: 'numerics are exactly the replicated step's')."""
    import jax
    import jax.numpy as jnp
    import optax

    from ragb_vae_tpu.parallel import (
        batch_sharding,
        create_mesh,
        init_zero2_state,
        make_zero2_train_step,
    )

    mesh = create_mesh()
    n = mesh.devices.size
    params = {"w": jnp.asarray(np.random.default_rng(0).standard_normal(4), jnp.float32)}
    x = np.random.default_rng(1).standard_normal((n, 4)).astype(np.float32)
    weights = np.zeros((n,), np.float32)
    weights[:3] = 1.0  # devices 3..n-1 hold ONLY padding

    def loss_fn(p, batch, key):
        per = jnp.sum(batch["x"] * p["w"], axis=-1) ** 2
        bw = batch["weights"]
        loss = jnp.sum(bw * per) / jnp.maximum(jnp.sum(bw), 1e-8)
        return loss, {"train/loss": loss}

    tx = optax.sgd(0.0)  # lr 0: isolate the reductions
    opt_state = init_zero2_state(params, tx, mesh)
    step = make_zero2_train_step(loss_fn, tx, mesh, max_grad_norm=None, donate=False)
    batch = {
        "x": jax.device_put(x, batch_sharding(mesh)),
        "weights": jax.device_put(weights, batch_sharding(mesh)),
    }
    _, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(2))

    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: jnp.mean(jnp.sum(jnp.asarray(x[:3]) * p, axis=-1) ** 2)
    )(params["w"])
    np.testing.assert_allclose(
        float(metrics["train/loss"]), float(ref_loss), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["train/grad_norm"]),
        float(jnp.linalg.norm(ref_grads)),
        rtol=1e-5,
    )

"""Mesh / ZeRO-sharding / grad-accumulation tests on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from ragb_vae_tpu.parallel import (
    DATA_AXIS,
    accumulated_grads,
    batch_sharding,
    create_mesh,
    pad_batch_to_mesh,
    replicated,
    shard_batch,
    split_microbatches,
    zero_sharding,
)


def test_create_mesh_spans_all_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == (DATA_AXIS,)


def test_create_mesh_shape_validation():
    with pytest.raises(ValueError):
        create_mesh(shape=(3,))


def test_batch_sharding_places_shards():
    mesh = create_mesh()
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    sharded = shard_batch(x, mesh)
    assert sharded.sharding.spec == P(DATA_AXIS)
    np.testing.assert_array_equal(np.asarray(sharded), x)


def test_pad_batch_to_mesh():
    mesh = create_mesh()
    assert pad_batch_to_mesh(5, mesh) == 8
    assert pad_batch_to_mesh(8, mesh) == 8
    assert pad_batch_to_mesh(9, mesh) == 16


def test_zero_sharding_splits_large_and_replicates_small():
    mesh = create_mesh()
    tree = {
        "big": jnp.zeros((1024, 128)),  # 2^17 elements >= threshold, dim0 % 8 == 0
        "small": jnp.zeros((4, 4)),
        "odd": jnp.zeros((1023, 257)),  # big but no dim divisible by 8
    }
    sh = zero_sharding(tree, mesh)
    assert sh["big"].spec == P(DATA_AXIS, None)
    assert sh["small"].spec == P()
    assert sh["odd"].spec == P()


def test_zero_sharded_optimizer_matches_replicated():
    """ZeRO residency must not change numerics (DeepSpeed equivalence)."""
    mesh = create_mesh()
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (1024, 64))  # large enough to shard
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 1024))
    y = jax.random.normal(jax.random.PRNGKey(2), (16, 64))
    tx = optax.adamw(1e-2, b1=0.5, b2=0.9)

    def loss_fn(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    def step(w, opt_state, x, y):
        grads = jax.grad(loss_fn)(w, x, y)
        updates, opt_state = tx.update(grads, opt_state, w)
        return optax.apply_updates(w, updates), opt_state

    # replicated run
    w_r, s_r = w, tx.init(w)
    for _ in range(3):
        w_r, s_r = jax.jit(step)(w_r, s_r, x, y)

    # ZeRO-sharded run
    shapes = jax.eval_shape(tx.init, w)
    shardings = zero_sharding(shapes, mesh)
    init = jax.jit(tx.init, out_shardings=shardings)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    sharded_step = jax.jit(
        step,
        in_shardings=(rep, shardings, bsh, bsh),
        out_shardings=(rep, shardings),
    )
    w_z, s_z = jax.device_put(w, rep), init(w)
    for _ in range(3):
        w_z, s_z = sharded_step(w_z, s_z, jax.device_put(x, bsh), jax.device_put(y, bsh))

    np.testing.assert_allclose(np.asarray(w_r), np.asarray(w_z), rtol=1e-5, atol=1e-6)


def test_split_microbatches_shapes_and_validation():
    batch = {"a": jnp.zeros((8, 3)), "b": jnp.zeros((8,))}
    micro = split_microbatches(batch, 4)
    assert micro["a"].shape == (4, 2, 3)
    assert micro["b"].shape == (4, 2)
    with pytest.raises(ValueError):
        split_microbatches(batch, 3)


def test_accumulated_grads_matches_full_batch():
    """Mean-of-microbatch grads == full-batch grads for a mean loss."""
    w = jax.random.normal(jax.random.PRNGKey(0), (6, 2))
    batch = {"x": jax.random.normal(jax.random.PRNGKey(1), (8, 6))}

    def loss_fn(params, b, key):
        del key
        pred = b["x"] @ params
        loss = jnp.mean(pred**2)
        return loss, {"loss": loss}

    key = jax.random.PRNGKey(2)
    l1, a1, g1 = accumulated_grads(loss_fn, w, batch, key, 1)
    l4, a4, g4 = accumulated_grads(loss_fn, w, batch, key, 4)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l4), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g4), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a1["loss"]), np.asarray(a4["loss"]), rtol=1e-6)


def test_accumulated_grads_pad_invariance():
    """Weighted microbatch accumulation: pads concentrated in one
    microbatch (including an ALL-pad microbatch) must not deflate or bias
    the loss/grads vs the unpadded weighted mean."""
    import jax
    import jax.numpy as jnp

    from ragb_vae_tpu.parallel.grad_accum import accumulated_grads

    params = jnp.asarray([0.5, -1.5, 2.0])
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 3)), jnp.float32)
    w = jnp.asarray([1, 1, 1, 0, 0, 0, 0, 0], jnp.float32)  # 3 real + 5 pads

    def loss_fn(p, batch, key):
        per = jnp.sum(batch["x"] * p, axis=-1) ** 2
        bw = batch["weights"]
        loss = jnp.sum(bw * per) / jnp.maximum(jnp.sum(bw), 1e-8)
        return loss, {"train/loss": loss}

    # ground truth: weighted mean over the 3 real samples only
    ref_loss, ref_grads = jax.value_and_grad(
        lambda p: jnp.mean(jnp.sum(x[:3] * p, axis=-1) ** 2)
    )(params)

    loss, aux, grads = accumulated_grads(
        loss_fn, params, {"x": x, "weights": w}, jax.random.PRNGKey(0), 2,
        micro_weight_fn=lambda mb: jnp.sum(mb["weights"]),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grads), np.asarray(ref_grads), rtol=1e-6)
    np.testing.assert_allclose(float(aux["train/loss"]), float(ref_loss), rtol=1e-6)

    # without the weighting, the all-pad second microbatch halves the loss
    # (the bug this guards against)
    biased_loss, _, _ = accumulated_grads(
        loss_fn, params, {"x": x, "weights": w}, jax.random.PRNGKey(0), 2
    )
    assert abs(float(biased_loss) - float(ref_loss) / 2) < 1e-5


# --- CLI parallelism bootstrap (shared by inference.run and the daemon) ----
def test_bootstrap_validate_tp_pp():
    from ragb_vae_tpu.parallel.bootstrap import validate_tp_pp

    validate_tp_pp(1, 1)
    validate_tp_pp(2, 1)
    validate_tp_pp(1, 2)
    with pytest.raises(SystemExit, match="mutually exclusive"):
        validate_tp_pp(2, 2)


def test_bootstrap_build_tp_mesh():
    from ragb_vae_tpu.parallel.bootstrap import build_tp_mesh

    assert build_tp_mesh(1) is None
    mesh = build_tp_mesh(2)
    assert mesh.axis_names == ("model",)
    assert mesh.devices.size == 2
    with pytest.raises(SystemExit, match="needs 99 devices"):
        build_tp_mesh(99)


def test_bootstrap_build_pipelined_transformer():
    from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig
    from ragb_vae_tpu.parallel.bootstrap import build_pipelined_transformer

    class M:
        transformer_config = FluxTransformerConfig.tiny()

    assert build_pipelined_transformer(M(), 1, dtype=jnp.float32) is None
    with pytest.raises(SystemExit, match="needs 99 devices"):
        build_pipelined_transformer(M(), 99, dtype=jnp.float32)
    pipe = build_pipelined_transformer(M(), 2, dtype=jnp.float32)
    assert pipe.n_stages == 2

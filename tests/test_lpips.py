"""LPIPS golden-parity tests (VERDICT round-1 item 4).

Our flax LPIPS (models/lpips.py) vs an independent torch restatement of
lpips.LPIPS(net="vgg") (tests/torch_lpips_ref.py) on identical random
weights — pins the VGG16 slice/pool index tables and the normalization /
lin-head / reduction semantics the reference training loss depends on
(reference src/models/losses.py:85-107, lpips_scale 0.5 operating point).
"""
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.models.lpips import (
    load_lpips_params,
    lpips_distance,
    maybe_build_lpips,
)
from tests.torch_lpips_ref import lpips_distance_torch, make_lpips_state


@pytest.fixture(scope="module")
def lpips_ckpt(tmp_path_factory):
    """Random lpips-vgg state dict saved in the real checkpoint format."""
    from ragb_vae_tpu.models.weights import save_torch_state

    state = make_lpips_state(seed=0)
    path = tmp_path_factory.mktemp("lpips") / "lpips_vgg.safetensors"
    save_torch_state(state, path)
    return path, state


def test_lpips_distance_matches_torch(lpips_ckpt):
    path, state = lpips_ckpt
    params = load_lpips_params(path)

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(2, 3, 32, 32)).astype(np.float32)
    y = rng.uniform(-1, 1, size=(2, 3, 32, 32)).astype(np.float32)

    golden = lpips_distance_torch(x, y, state)
    ours = np.asarray(
        lpips_distance(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(y.transpose(0, 2, 3, 1)),
            params,
        )
    )
    np.testing.assert_allclose(ours, golden, atol=1e-4, rtol=1e-4)
    assert golden.min() > 0.0  # distinct inputs -> positive distance


def test_lpips_identity_is_zero(lpips_ckpt):
    path, _ = lpips_ckpt
    params = load_lpips_params(path)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 16, 16, 3)).astype(np.float32))
    d = np.asarray(lpips_distance(x, x, params))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_perceptual_loss_composites_and_weights(lpips_ckpt):
    """The training-loop perceptual term: black/white composites averaged,
    per-sample weights honored (zero-weight pad samples drop out)."""
    path, state = lpips_ckpt
    fn = maybe_build_lpips(path)
    assert fn is not None

    rng = np.random.default_rng(3)
    pred = rng.uniform(-1, 1, size=(2, 16, 16, 4)).astype(np.float32)
    target = rng.uniform(-1, 1, size=(2, 16, 16, 4)).astype(np.float32)

    # golden: composites computed the reference way, fed unnormalized
    from ragb_vae_tpu.models.losses import perceptual_composites

    pb, tb, pw, tw = (np.asarray(a) for a in perceptual_composites(
        jnp.asarray(pred), jnp.asarray(target)))
    golden_black = lpips_distance_torch(tb.transpose(0, 3, 1, 2), pb.transpose(0, 3, 1, 2), state)
    golden_white = lpips_distance_torch(tw.transpose(0, 3, 1, 2), pw.transpose(0, 3, 1, 2), state)
    golden = 0.5 * (golden_black + golden_white)

    ours = float(fn(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(ours, golden.mean(), atol=1e-4, rtol=1e-4)

    # weighted: second sample masked out == first sample alone
    w = jnp.asarray([1.0, 0.0])
    ours_w = float(fn(jnp.asarray(pred), jnp.asarray(target), w))
    np.testing.assert_allclose(ours_w, golden[0], atol=1e-4, rtol=1e-4)


def test_lpips_in_training_step(lpips_ckpt):
    """lpips_scale > 0 flows through the jitted VAE train step (finite loss,
    train/lpips metric emitted)."""
    import jax

    from ragb_vae_tpu.models.losses import AlphaVaeLossConfig
    from ragb_vae_tpu.models.rgba_vae import RgbaVAE
    from ragb_vae_tpu.models.vae_config import AutoencoderConfig
    from ragb_vae_tpu.training.vae_step import (
        VaeStepConfig,
        make_optimizer,
        make_train_step,
    )

    path, _ = lpips_ckpt
    lpips_fn = maybe_build_lpips(path)

    config = AutoencoderConfig.tiny()
    config.in_channels = 4
    config.out_channels = 4
    model = RgbaVAE(config=config)
    params = model.init_params(jax.random.PRNGKey(0), image_size=16)
    tx = make_optimizer(1e-4, max_grad_norm=1.0)
    opt_state = tx.init(params)

    step = make_train_step(
        model,
        tx,
        AlphaVaeLossConfig(),
        VaeStepConfig(kl_scale=1e-6, lpips_scale=0.5),
        lpips_fn=lpips_fn,
    )
    rng = np.random.default_rng(4)
    batch = {"images": jnp.asarray(rng.random((2, 16, 16, 4), dtype=np.float32))}
    _, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["train/loss"]))
    assert float(metrics["train/lpips"]) > 0.0


def test_lpips_gradient_flows_through_pred(lpips_ckpt):
    """Round-3 regression: the perceptual term must backprop through PRED
    and be flat in TARGET. The stop_gradient used to land on the stream
    callers passed pred through, silently zeroing the entire LPIPS
    gradient in training (found by benchmarks/train_bisect.py when XLA
    dead-code-eliminated the whole decode+LPIPS backward)."""
    import jax

    path, _ = lpips_ckpt
    fn = maybe_build_lpips(path)
    rng = np.random.default_rng(11)
    pred = jnp.asarray(rng.uniform(-1, 1, size=(1, 16, 16, 4)).astype(np.float32))
    target = jnp.asarray(rng.uniform(-1, 1, size=(1, 16, 16, 4)).astype(np.float32))

    g_pred = jax.grad(lambda p: fn(p, target).sum())(pred)
    g_target = jax.grad(lambda t: fn(pred, t).sum())(target)
    assert float(jnp.linalg.norm(g_pred)) > 0.0
    np.testing.assert_allclose(np.asarray(g_target), 0.0)

    # and through the raw distance too
    params = load_lpips_params(path)
    g = jax.grad(
        lambda p: jnp.sum(lpips_distance(p[..., :3], target[..., :3], params))
    )(pred)
    assert float(jnp.linalg.norm(g)) > 0.0


def test_lpips_bf16_compute_dtype_close_to_fp32(lpips_ckpt):
    """compute_dtype=bf16 (the training/autocast path) stays close to the
    fp32 golden path and still carries a pred gradient."""
    import jax

    path, _ = lpips_ckpt
    fn32 = maybe_build_lpips(path)
    fn16 = maybe_build_lpips(path, compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(12)
    pred = jnp.asarray(rng.uniform(-1, 1, size=(2, 32, 32, 4)).astype(np.float32))
    target = jnp.asarray(rng.uniform(-1, 1, size=(2, 32, 32, 4)).astype(np.float32))
    v32 = float(fn32(pred, target))
    v16 = float(fn16(pred, target))
    assert abs(v32 - v16) / max(abs(v32), 1e-6) < 0.05
    g = jax.grad(lambda p: fn16(p, target).sum())(pred)
    assert float(jnp.linalg.norm(g)) > 0.0


def test_lpips_remat_off_matches(lpips_ckpt):
    """remat=False (resident VGG activations) is a schedule choice only:
    identical distance values and identical gradients."""
    import jax

    from ragb_vae_tpu.models.lpips import lpips_distance, maybe_build_lpips

    path, _ = lpips_ckpt
    params = load_lpips_params(path)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))

    def d_remat(x):
        return lpips_distance(x, y, params).sum()

    def d_flat(x):
        return lpips_distance(x, y, params, remat=False).sum()

    v1, g1 = jax.value_and_grad(d_remat)(x)
    v2, g2 = jax.value_and_grad(d_flat)(x)
    np.testing.assert_allclose(v2, v1, rtol=1e-6)
    np.testing.assert_allclose(g2, g1, rtol=1e-5, atol=1e-7)

    # builder knob reaches the distance call and preserves values
    pa = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 4)).astype(np.float32))
    pb = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 4)).astype(np.float32))
    fn_flat = maybe_build_lpips(path, remat=False)
    fn_ref = maybe_build_lpips(path)
    np.testing.assert_allclose(
        np.asarray(fn_flat(pa, pb)), np.asarray(fn_ref(pa, pb)), rtol=1e-6)

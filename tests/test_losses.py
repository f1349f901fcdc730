"""AlphaVAE loss parity vs an independent torch restatement of losses.py."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ragb_vae_tpu.models import (
    AlphaVaeLossConfig,
    alphavae_reconstruction_loss,
    kl_loss,
    perceptual_composites,
    reduce_loss,
)
from ragb_vae_tpu.ops.gaussian import DiagonalGaussian

EB = (-0.0357, -0.0811, -0.1797)
EB2 = (0.3163, 0.3060, 0.3634)


def _torch_recon_loss(pred, target, reduce_mean=False, naive=False):
    pred = torch.as_tensor(pred).permute(0, 3, 1, 2)
    target = torch.as_tensor(target).permute(0, 3, 1, 2)
    if naive:
        value = (pred - target).pow(2)
    else:
        eb = torch.tensor(EB).view(1, 3, 1, 1)
        eb2 = torch.tensor(EB2).view(1, 3, 1, 1)
        t_rgb, p_rgb = target[:, :3], pred[:, :3]
        t_a = (target[:, 3:] + 1.0) * 0.5
        p_a = (pred[:, 3:] + 1.0) * 0.5
        d = t_rgb * t_a - p_rgb * p_a
        da = t_a - p_a
        value = d.pow(2) - 2.0 * eb * d * da + eb2 * da.pow(2)
    if reduce_mean:
        return value.mean()
    return value.reshape(value.shape[0], -1).sum(dim=1).mean()


@pytest.mark.parametrize("reduce_mean", [False, True])
def test_recon_loss_matches_torch(reduce_mean):
    rng = np.random.default_rng(0)
    pred = rng.uniform(-1, 1, size=(3, 8, 8, 4)).astype(np.float32)
    target = rng.uniform(-1, 1, size=(3, 8, 8, 4)).astype(np.float32)
    got = float(alphavae_reconstruction_loss(jnp.asarray(pred), jnp.asarray(target), reduce_mean=reduce_mean))
    want = float(_torch_recon_loss(pred, target, reduce_mean=reduce_mean))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("reduce_mean", [False, True])
def test_naive_mse_matches_torch(reduce_mean):
    rng = np.random.default_rng(1)
    pred = rng.uniform(-1, 1, size=(2, 4, 4, 4)).astype(np.float32)
    target = rng.uniform(-1, 1, size=(2, 4, 4, 4)).astype(np.float32)
    got = float(
        alphavae_reconstruction_loss(
            jnp.asarray(pred), jnp.asarray(target), reduce_mean=reduce_mean, use_naive_mse=True
        )
    )
    want = float(_torch_recon_loss(pred, target, reduce_mean=reduce_mean, naive=True))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_recon_loss_zero_on_identical():
    x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, size=(1, 4, 4, 4)).astype(np.float32))
    assert float(alphavae_reconstruction_loss(x, x)) == 0.0


def test_kl_loss_reduction_modes():
    rng = np.random.default_rng(3)
    dist = DiagonalGaussian(
        jnp.asarray(rng.normal(size=(4, 2, 2, 2)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(4, 2, 2, 2)).astype(np.float32)),
    )
    per_sample = np.asarray(dist.kl())
    # kl() is already (B,): both reductions are the batch mean
    np.testing.assert_allclose(float(kl_loss(dist, reduce_mean=True)), per_sample.mean(), rtol=1e-6)
    np.testing.assert_allclose(float(kl_loss(dist, reduce_mean=False)), per_sample.mean(), rtol=1e-6)


def test_kl_vs_reference_zero_when_equal():
    rng = np.random.default_rng(4)
    mean = jnp.asarray(rng.normal(size=(2, 2, 2, 2)).astype(np.float32))
    logvar = jnp.asarray(rng.normal(size=(2, 2, 2, 2)).astype(np.float32))
    d = DiagonalGaussian(mean, logvar)
    np.testing.assert_allclose(float(kl_loss(d, d)), 0.0, atol=1e-6)


def test_perceptual_composites_match_reference_formulas():
    rng = np.random.default_rng(5)
    pred = rng.uniform(-1, 1, size=(2, 4, 4, 4)).astype(np.float32)
    target = rng.uniform(-1, 1, size=(2, 4, 4, 4)).astype(np.float32)
    pb, tb, pw, tw = perceptual_composites(jnp.asarray(pred), jnp.asarray(target))
    t_a = (target[..., 3:] + 1) / 2
    p_a = (pred[..., 3:] + 1) / 2
    np.testing.assert_allclose(np.asarray(tb), target[..., :3] * t_a, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pw), pred[..., :3] * p_a + (1 - p_a), atol=1e-6)
    np.testing.assert_allclose(np.asarray(tw), target[..., :3] * t_a + (1 - t_a), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pb), pred[..., :3] * p_a, atol=1e-6)


def test_loss_config_validation():
    with pytest.raises(ValueError):
        AlphaVaeLossConfig(eb=(1.0, 2.0))
    cfg = AlphaVaeLossConfig(reduce_mean=True)
    x = jnp.zeros((1, 2, 2, 4))
    assert float(cfg.reconstruction_loss(x, x)) == 0.0


def test_reduce_loss_scalar_passthrough():
    assert float(reduce_loss(jnp.asarray(3.5), reduce_mean=False)) == 3.5

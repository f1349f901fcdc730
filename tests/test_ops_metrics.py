import jax.numpy as jnp
import numpy as np
import torch

from ragb_vae_tpu.ops import alpha_mae, psnr


def _torch_psnr(pred, target):
    mse = torch.mean((torch.as_tensor(pred) - torch.as_tensor(target)) ** 2, dim=(1, 2, 3))
    mse = torch.clamp(mse, min=1e-8)
    return -10.0 * torch.log10(mse)


def test_psnr_matches_torch():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(4, 8, 8, 3)).astype(np.float32)
    b = rng.uniform(size=(4, 8, 8, 3)).astype(np.float32)
    got = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b)))
    want = _torch_psnr(a, b).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_psnr_perfect_recon_clamped():
    x = jnp.ones((1, 4, 4, 3)) * 0.5
    val = float(psnr(x, x)[0])
    assert abs(val - 80.0) < 1e-3  # -10*log10(1e-8)


def test_alpha_mae():
    pred = jnp.zeros((2, 4, 4, 4))
    target = jnp.concatenate([jnp.zeros((2, 4, 4, 3)), jnp.full((2, 4, 4, 1), 0.25)], axis=-1)
    got = np.asarray(alpha_mae(pred, target))
    np.testing.assert_allclose(got, 0.25, atol=1e-7)

"""DiagonalGaussian vs an independent torch formulation of diffusers' math."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from ragb_vae_tpu.ops.gaussian import DiagonalGaussian, split_batch


def _torch_kl(mean, logvar, other=None):
    """Independent torch implementation of diffusers DiagonalGaussianDistribution.kl."""
    mean = torch.as_tensor(mean)
    logvar = torch.clamp(torch.as_tensor(logvar), -30.0, 20.0)
    var = torch.exp(logvar)
    dims = list(range(1, mean.ndim))
    if other is None:
        return 0.5 * torch.sum(mean.pow(2) + var - 1.0 - logvar, dim=dims)
    o_mean = torch.as_tensor(other[0])
    o_logvar = torch.clamp(torch.as_tensor(other[1]), -30.0, 20.0)
    o_var = torch.exp(o_logvar)
    return 0.5 * torch.sum(
        (mean - o_mean).pow(2) / o_var + var / o_var - 1.0 - logvar + o_logvar, dim=dims
    )


def test_from_params_split_and_clamp():
    rng = np.random.default_rng(1)
    params = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    params[..., 4:] = 50.0  # logvar out of clamp range
    dist = DiagonalGaussian.from_params(jnp.asarray(params))
    np.testing.assert_allclose(np.asarray(dist.mean), params[..., :4])
    np.testing.assert_allclose(np.asarray(dist.logvar), 20.0)


def test_kl_standard_normal_matches_torch():
    rng = np.random.default_rng(2)
    mean = rng.normal(size=(3, 5, 5, 4)).astype(np.float32)
    logvar = rng.normal(size=(3, 5, 5, 4)).astype(np.float32)
    dist = DiagonalGaussian(jnp.asarray(mean), jnp.asarray(logvar))
    got = np.asarray(dist.kl())
    want = _torch_kl(mean, logvar).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_kl_vs_reference_matches_torch():
    rng = np.random.default_rng(3)
    shape = (2, 4, 4, 4)
    mean, logvar = rng.normal(size=shape).astype(np.float32), rng.normal(size=shape).astype(np.float32)
    o_mean, o_logvar = rng.normal(size=shape).astype(np.float32), rng.normal(size=shape).astype(np.float32)
    dist = DiagonalGaussian(jnp.asarray(mean), jnp.asarray(logvar))
    other = DiagonalGaussian(jnp.asarray(o_mean), jnp.asarray(o_logvar))
    got = np.asarray(dist.kl(other))
    want = _torch_kl(mean, logvar, other=(o_mean, o_logvar)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_kl_zero_for_standard_normal():
    dist = DiagonalGaussian(jnp.zeros((1, 2, 2, 4)), jnp.zeros((1, 2, 2, 4)))
    np.testing.assert_allclose(np.asarray(dist.kl()), 0.0, atol=1e-7)


def test_sample_statistics():
    mean = jnp.full((1, 64, 64, 4), 2.0)
    logvar = jnp.full((1, 64, 64, 4), np.log(0.25).astype(np.float32))
    dist = DiagonalGaussian(mean, logvar)
    s = np.asarray(dist.sample(jax.random.PRNGKey(0)))
    assert abs(s.mean() - 2.0) < 0.02
    assert abs(s.std() - 0.5) < 0.02


def test_sample_deterministic_given_key():
    dist = DiagonalGaussian(jnp.zeros((1, 4, 4, 2)), jnp.zeros((1, 4, 4, 2)))
    a = dist.sample(jax.random.PRNGKey(7))
    b = dist.sample(jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_split_batch_triplet():
    rng = np.random.default_rng(4)
    params = jnp.asarray(rng.normal(size=(6, 2, 2, 4)).astype(np.float32))
    dist = DiagonalGaussian.from_params(params)
    a, b, c = split_batch(dist, 3)
    assert a.mean.shape == (2, 2, 2, 2)
    np.testing.assert_array_equal(np.asarray(a.mean), np.asarray(dist.mean[:2]))
    np.testing.assert_array_equal(np.asarray(c.logvar), np.asarray(dist.logvar[4:]))

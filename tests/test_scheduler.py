"""FlowMatchEuler scheduler + SD3 sampling-utility tests."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.models.scheduler import (
    FlowMatchEulerConfig,
    FlowMatchEulerScheduler,
    calc_mu,
    compute_density_for_timestep_sampling,
    compute_loss_weighting_for_sd3,
)


def test_default_schedule_shapes_and_range():
    sched = FlowMatchEulerScheduler()
    assert sched.timesteps.shape == (1000,)
    assert sched.sigmas.shape == (1000,)
    assert sched.timesteps[0] == pytest.approx(1000.0)
    assert sched.sigmas[-1] == pytest.approx(1e-3)
    assert np.all(np.diff(sched.sigmas) < 0)


def test_static_shift_formula():
    cfg = FlowMatchEulerConfig(use_dynamic_shifting=False, shift=3.0)
    sched = FlowMatchEulerScheduler(cfg)
    # sigma' = s*sigma/(1+(s-1)*sigma) with raw sigma = t/N
    raw = np.linspace(1, 1000, 1000)[::-1] / 1000.0
    expected = 3.0 * raw / (1.0 + 2.0 * raw)
    np.testing.assert_allclose(sched.sigmas, expected, rtol=1e-6)


def test_set_timesteps_dynamic_shift():
    sched = FlowMatchEulerScheduler()
    mu = calc_mu(sched.config, 1024)
    sched.set_timesteps(20, mu=mu)
    assert sched.sigmas.shape == (21,)
    assert sched.timesteps.shape == (20,)
    assert sched.sigmas[-1] == 0.0
    # dynamic shift: sigma' = e^mu / (e^mu + 1/sigma - 1)
    raw0 = sched.sigma_max
    expected0 = math.exp(mu) / (math.exp(mu) + (1.0 / raw0 - 1.0))
    assert sched.sigmas[0] == pytest.approx(expected0, rel=1e-6)
    np.testing.assert_allclose(sched.timesteps, sched.sigmas[:-1] * 1000.0, rtol=1e-5)


def test_set_timesteps_requires_mu_when_dynamic():
    sched = FlowMatchEulerScheduler()
    with pytest.raises(ValueError):
        sched.set_timesteps(10)


def test_calc_mu_interp_and_clamp():
    cfg = FlowMatchEulerConfig()
    # at base_seq -> base_shift; at max_seq -> max_shift
    assert calc_mu(cfg, 256) == pytest.approx(0.5)
    assert calc_mu(cfg, 4096) == pytest.approx(1.15)
    assert calc_mu(cfg, 1) == pytest.approx(0.5)  # clamped up
    assert calc_mu(cfg, 10**6) == pytest.approx(1.15)  # clamped down
    mid = calc_mu(cfg, (256 + 4096) // 2)
    assert 0.5 < mid < 1.15
    assert calc_mu(FlowMatchEulerConfig(use_dynamic_shifting=False), 1024) is None


def test_euler_step_reaches_x0_on_perfect_velocity():
    """With v = noise − x0 exactly, integrating the full schedule from pure
    noise must land on x0 (flow matching ODE is linear)."""
    sched = FlowMatchEulerScheduler()
    sched.set_timesteps(8, mu=calc_mu(sched.config, 256))
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 4, 4, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    # start at sigma_0: x = (1-s0)x0 + s0*noise
    x = sched.scale_noise(x0, float(sched.sigmas[0]), noise)
    v = noise - x0
    for i in range(len(sched.timesteps)):
        x = sched.step(v, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_step_is_jittable():
    sched = FlowMatchEulerScheduler()
    sched.set_timesteps(4, mu=0.7)
    x = jnp.ones((1, 2, 2, 2))
    v = jnp.ones_like(x)

    @jax.jit
    def run(x, v):
        def body(i, x):
            return sched.step(v, i, x)

        return jax.lax.fori_loop(0, 4, body, x)

    out = run(x, v)
    expected = 1.0 + (0.0 - sched.sigmas[0]) * 1.0  # telescoping sum
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)


def test_density_logit_normal_in_unit_interval():
    u = compute_density_for_timestep_sampling(jax.random.PRNGKey(0), 512)
    u = np.asarray(u)
    assert u.shape == (512,)
    assert np.all((u > 0) & (u < 1))
    # sigmoid of standard normal has mean 0.5
    assert abs(u.mean() - 0.5) < 0.05


def test_loss_weighting_schemes():
    sigmas = jnp.asarray([0.25, 0.5, 1.0])
    np.testing.assert_allclose(
        np.asarray(compute_loss_weighting_for_sd3(sigmas)), 1.0
    )
    np.testing.assert_allclose(
        np.asarray(compute_loss_weighting_for_sd3(sigmas, weighting_scheme="sigma_sqrt")),
        np.asarray(sigmas) ** -2.0,
        rtol=1e-6,
    )

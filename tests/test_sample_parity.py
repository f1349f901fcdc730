"""Golden sampling-trajectory parity for the inference product.

`sample_latents_from_noise` (the deterministic core of
FluxTextAlphaModel.sample) vs an INDEPENDENT torch restatement of the
reference sampling loop (reference flux_kontext_textalpha.py:430-500):
dynamic-shift sigma schedule (:257-283), per-step re-noising (:463),
cond+target packing (:464-471), token slice + unpack (:487-489), and the
FlowMatchEuler update (:490-495). All noise (init + per-step draws) is
injected so torch/JAX RNG differences cannot mask a divergence; the FULL
latent trajectory must match step by step.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig
from ragb_vae_tpu.models.flux_weights import params_to_flux_state
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.scheduler import FlowMatchEulerScheduler
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from tests.torch_flux_ref import TorchFluxRef


# ---------------------------------------------------------------------------
# Torch restatements of the reference loop's building blocks
# ---------------------------------------------------------------------------
def _torch_pack(latents_nchw: torch.Tensor) -> torch.Tensor:
    b, c, h, w = latents_nchw.shape
    x = latents_nchw.view(b, c, h // 2, 2, w // 2, 2)
    x = x.permute(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def _torch_unpack(tokens: torch.Tensor, h: int, w: int) -> torch.Tensor:
    b, _, packed_c = tokens.shape
    c = packed_c // 4
    x = tokens.view(b, h // 2, w // 2, c, 2, 2)
    x = x.permute(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)


def _torch_image_ids(h2: int, w2: int) -> np.ndarray:
    ids = np.zeros((h2, w2, 3), np.float32)
    ids[..., 1] += np.arange(h2)[:, None]
    ids[..., 2] += np.arange(w2)[None, :]
    return ids.reshape(h2 * w2, 3)


def _torch_inference_schedule(num_steps: int, seq_len: int):
    """Restates diffusers FlowMatchEulerDiscreteScheduler.set_timesteps for
    FLUX defaults (num_train_timesteps=1000, use_dynamic_shifting=True) plus
    the reference's `_calc_mu` (:257-278). Returns (timesteps, sigmas) with
    the trailing 0 sigma the Euler step reads at the last iteration."""
    n_train = 1000
    base_seq, max_seq = 256, 4096
    base_shift, max_shift = 0.5, 1.15
    seq = max(min(int(seq_len), max_seq), base_seq)
    m = (max_shift - base_shift) / (max_seq - base_seq)
    mu = seq * m + (base_shift - m * base_seq)

    sigma_max, sigma_min = 1.0, 1.0 / n_train
    timesteps = np.linspace(sigma_max * n_train, sigma_min * n_train, num_steps, dtype=np.float64)
    sigmas = timesteps / n_train
    sigmas = math.exp(mu) / (math.exp(mu) + (1.0 / sigmas - 1.0))  # exponential time shift
    timesteps = (sigmas * n_train).astype(np.float32)
    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return timesteps, sigmas


def _tiny_model(rng: np.random.Generator):
    t_cfg = FluxTransformerConfig.tiny()
    vae_cfg = AutoencoderConfig.tiny()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = 64
    model = FluxTextAlphaModel(
        transformer_config=t_cfg,
        vae=RgbaVAE(config=vae_cfg),
        scheduler=FlowMatchEulerScheduler(),
        prompt_embeds=jnp.asarray(
            rng.standard_normal((1, 4, t_cfg.joint_attention_dim)), jnp.float32
        ),
        pooled_prompt_embeds=jnp.asarray(
            rng.standard_normal((1, t_cfg.pooled_projection_dim)), jnp.float32
        ),
        text_ids=jnp.zeros((4, 3), jnp.float32),
        remat=False,
    )
    dummy = dict(
        hidden_states=jnp.zeros((1, 8, t_cfg.in_channels)),
        encoder_hidden_states=model.prompt_embeds,
        pooled_projections=model.pooled_prompt_embeds,
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((8, 3)),
        txt_ids=model.text_ids,
        guidance=jnp.asarray([3.5]),
    )
    t_params = model.transformer.init(jax.random.PRNGKey(1), **dummy)["params"]
    return model, t_cfg, t_params


def test_sample_trajectory_matches_torch_restatement():
    rng = np.random.default_rng(7)
    model, t_cfg, t_params = _tiny_model(rng)

    bsz, lh, lw, lc = 2, 8, 8, 4
    num_steps = 6
    cond = rng.standard_normal((bsz, lh, lw, lc)).astype(np.float32)
    init_noise = rng.standard_normal((bsz, lh, lw, lc)).astype(np.float32)
    step_noises = rng.standard_normal((num_steps, bsz, lh, lw, lc)).astype(np.float32)

    final_jax, traj_jax = model.sample_latents_from_noise(
        t_params,
        jnp.asarray(cond),
        jnp.asarray(init_noise),
        jnp.asarray(step_noises),
        return_trajectory=True,
    )
    traj_jax = np.asarray(traj_jax)

    # ---- independent torch restatement of the reference loop ----
    seq_len = (64 // model.vae_scale_factor) ** 2  # _calc_mu's h*h estimate
    timesteps, sigmas = _torch_inference_schedule(num_steps, seq_len)
    # pin the dynamic-shift schedule itself against the JAX scheduler
    sched = model.sampling_schedule(num_steps)
    np.testing.assert_allclose(np.asarray(sched.sigmas), sigmas, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.timesteps), timesteps, atol=1e-3)

    ref = TorchFluxRef(t_cfg, params_to_flux_state(jax.device_get(t_params)))
    cond_t = torch.from_numpy(cond).permute(0, 3, 1, 2)
    packed_cond = _torch_pack(cond_t)
    seq_cond = packed_cond.shape[1]
    ids_single = _torch_image_ids(lh // 2, lw // 2)
    img_ids = np.concatenate([ids_single, ids_single], axis=0)

    latents = torch.from_numpy(init_noise).permute(0, 3, 1, 2)
    traj_ref = []
    for i in range(num_steps):
        sigma = float(sigmas[i])
        noise_i = torch.from_numpy(step_noises[i]).permute(0, 3, 1, 2)
        noisy_target = (1.0 - sigma) * latents + sigma * noise_i  # :463 re-noising
        packed = torch.cat([packed_cond, _torch_pack(noisy_target)], dim=1).numpy()
        pred = ref.forward(
            hidden_states=packed,
            encoder_hidden_states=np.broadcast_to(
                np.asarray(model.prompt_embeds), (bsz, 4, t_cfg.joint_attention_dim)
            ),
            pooled_projections=np.broadcast_to(
                np.asarray(model.pooled_prompt_embeds), (bsz, t_cfg.pooled_projection_dim)
            ),
            timestep=np.full((bsz,), timesteps[i] / 1000.0, np.float32),
            img_ids=img_ids,
            txt_ids=np.zeros((4, 3), np.float32),
            guidance=np.full((bsz,), 3.5, np.float32),
        )
        pred_target = _torch_unpack(torch.from_numpy(pred[:, seq_cond:]), lh, lw)
        latents = latents + (float(sigmas[i + 1]) - sigma) * pred_target  # Euler
        traj_ref.append(latents.permute(0, 2, 3, 1).numpy())

    traj_ref = np.stack(traj_ref)
    # step-by-step trajectory parity (errors accumulate over the 6 steps)
    np.testing.assert_allclose(traj_jax, traj_ref, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(final_jax), traj_ref[-1], atol=2e-3, rtol=2e-3)


def test_per_step_renoising_quirk_is_live():
    """Pins the reference's :463 quirk by assertion: fresh noise injected at
    a MIDDLE step (not just init) must change the trajectory from that step
    on — if the loop only consumed init noise, this would be a no-op."""
    rng = np.random.default_rng(11)
    model, _, t_params = _tiny_model(rng)

    bsz, lh, lw, lc = 1, 8, 8, 4
    num_steps = 4
    cond = jnp.asarray(rng.standard_normal((bsz, lh, lw, lc)), jnp.float32)
    init_noise = jnp.asarray(rng.standard_normal((bsz, lh, lw, lc)), jnp.float32)
    step_noises = rng.standard_normal((num_steps, bsz, lh, lw, lc)).astype(np.float32)

    _, traj_a = model.sample_latents_from_noise(
        t_params, cond, init_noise, jnp.asarray(step_noises), return_trajectory=True
    )
    perturbed = step_noises.copy()
    perturbed[2] += 1.0  # only step 2's re-noising draw differs
    _, traj_b = model.sample_latents_from_noise(
        t_params, cond, init_noise, jnp.asarray(perturbed), return_trajectory=True
    )
    traj_a, traj_b = np.asarray(traj_a), np.asarray(traj_b)
    # steps before the perturbation are identical...
    np.testing.assert_array_equal(traj_a[:2], traj_b[:2])
    # ...and the perturbed step's output moves: the noise is consumed live.
    assert np.abs(traj_a[2] - traj_b[2]).max() > 1e-4


def test_sample_consumes_deterministic_core():
    """sample() must route through sample_latents_from_noise (same schedule,
    same per-step fold_in draws): two calls with one key are identical."""
    rng = np.random.default_rng(3)
    model, _, t_params = _tiny_model(rng)
    vae_params = model.vae.init_params(jax.random.PRNGKey(0))
    gt = jnp.asarray(rng.uniform(size=(1, 64, 64, 4)), jnp.float32)
    key = jax.random.PRNGKey(5)
    a = model.sample(t_params, vae_params, gt, num_inference_steps=2, key=key)
    b = model.sample(t_params, vae_params, gt, num_inference_steps=2, key=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

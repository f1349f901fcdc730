"""Flow-matching loss composition parity: compute_loss_from_latents vs an
independent torch pipeline (noise/timestep draws injected), covering the
pack->concat->transformer->slice->unpack->velocity-target chain."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
from ragb_vae_tpu.models.flux_transformer import FluxTransformer2D, FluxTransformerConfig
from ragb_vae_tpu.models.flux_weights import params_to_flux_state
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.scheduler import FlowMatchEulerScheduler
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from tests.torch_flux_ref import TorchFluxRef


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


def test_compute_loss_matches_torch_pipeline():
    t_cfg = FluxTransformerConfig.tiny()
    vae_cfg = AutoencoderConfig.tiny()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = 64
    rng = np.random.default_rng(0)

    model = FluxTextAlphaModel(
        transformer_config=t_cfg,
        vae=RgbaVAE(config=vae_cfg),
        scheduler=FlowMatchEulerScheduler(),
        prompt_embeds=jnp.asarray(rng.standard_normal((1, 4, t_cfg.joint_attention_dim)), jnp.float32),
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

    bsz, lh, lw, lc = 2, 8, 8, 4
    cond = rng.standard_normal((bsz, lh, lw, lc)).astype(np.float32)
    target = rng.standard_normal((bsz, lh, lw, lc)).astype(np.float32)
    noise = rng.standard_normal((bsz, lh, lw, lc)).astype(np.float32)
    u = np.asarray([0.31, 0.87], np.float32)

    loss_jax, stats = model.compute_loss_from_latents(
        t_params, jnp.asarray(cond), jnp.asarray(target), jnp.asarray(noise), jnp.asarray(u)
    )

    # ---- independent torch pipeline ----
    sched = model._train_sched
    max_idx = min(len(sched.timesteps) - 1, len(sched.sigmas) - 1)
    indices = np.clip((u * 1000).astype(np.int64), 0, max_idx)
    timesteps = np.asarray(sched.timesteps)[indices]
    sigmas = np.asarray(sched.sigmas)[indices].reshape(bsz, 1, 1, 1)

    noisy = (1.0 - sigmas) * target + sigmas * noise
    cond_t = torch.from_numpy(cond).permute(0, 3, 1, 2)
    noisy_t = torch.from_numpy(noisy.astype(np.float32)).permute(0, 3, 1, 2)
    packed = torch.cat([_torch_pack(cond_t), _torch_pack(noisy_t)], dim=1).numpy()

    ids_single = _torch_image_ids(lh // 2, lw // 2)
    img_ids = np.concatenate([ids_single, ids_single], axis=0)

    ref = TorchFluxRef(t_cfg, params_to_flux_state(jax.device_get(t_params)))
    pred = ref.forward(
        hidden_states=packed,
        encoder_hidden_states=np.broadcast_to(
            np.asarray(model.prompt_embeds), (bsz, 4, t_cfg.joint_attention_dim)
        ),
        pooled_projections=np.broadcast_to(
            np.asarray(model.pooled_prompt_embeds), (bsz, t_cfg.pooled_projection_dim)
        ),
        timestep=timesteps / 1000.0,
        img_ids=img_ids,
        txt_ids=np.zeros((4, 3), np.float32),
        guidance=np.full((bsz,), 3.5, np.float32),
    )
    seq_cond = packed.shape[1] // 2
    pred_target = _torch_unpack(torch.from_numpy(pred[:, seq_cond:]), lh, lw)
    loss_target = torch.from_numpy((noise - target).astype(np.float32)).permute(0, 3, 1, 2)
    loss_ref = torch.mean(
        ((pred_target - loss_target) ** 2).reshape(bsz, -1).mean(dim=1)
    ).item()

    assert float(loss_jax) == pytest_approx(loss_ref)
    assert float(stats["timesteps_mean"]) == pytest_approx(float(timesteps.mean()))


def pytest_approx(value, rel=2e-4):
    import pytest

    return pytest.approx(value, rel=rel, abs=2e-4)

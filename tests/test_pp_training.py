"""Pipeline-parallel LoRA TRAINING (parallel/pipeline.py, VERDICT r3 item 6).

The GPipe microbatched forward/backward must reproduce the monolithic
`compute_loss_from_latents` loss AND its LoRA gradients exactly (fp32,
same math split across per-stage programs), and one optimizer step must
land on the same adapters. The reference's training is monolithic
DeepSpeed ZeRO (src/training/flux_kontext_textalpha_lora.py) — pp
training is beyond-parity capability for bases that exceed one chip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel
from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig
from ragb_vae_tpu.models.flux_weights import merge_params, split_lora_params
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.scheduler import (
    FlowMatchEulerConfig,
    FlowMatchEulerScheduler,
)
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.parallel.pipeline import (
    PipelinedFluxTransformer,
    PipelineLoraTrainer,
)

RANK, ALPHA = 2, 4.0


def tiny_model():
    cfg = FluxTransformerConfig(
        in_channels=16,
        num_layers=2,
        num_single_layers=3,
        attention_head_dim=32,
        num_attention_heads=2,
        joint_attention_dim=32,
        pooled_projection_dim=16,
        guidance_embeds=True,
        axes_dims_rope=(8, 12, 12),
    )
    vae_cfg = AutoencoderConfig.tiny()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = 32
    rng = np.random.default_rng(0)
    model = FluxTextAlphaModel(
        transformer_config=cfg,
        vae=RgbaVAE(config=vae_cfg),
        scheduler=FlowMatchEulerScheduler(FlowMatchEulerConfig()),
        prompt_embeds=jnp.asarray(
            rng.standard_normal((1, 4, cfg.joint_attention_dim)), jnp.float32
        ),
        pooled_prompt_embeds=jnp.asarray(
            rng.standard_normal((1, cfg.pooled_projection_dim)), jnp.float32
        ),
        text_ids=jnp.zeros((4, 3), jnp.float32),
        lora_rank=RANK,
        lora_alpha=ALPHA,
    )
    return cfg, model


def init_params(cfg, model, bsz=4):
    rng = np.random.default_rng(1)
    inputs = dict(
        hidden_states=jnp.asarray(
            rng.standard_normal((bsz, 8, cfg.in_channels)), jnp.float32
        ),
        encoder_hidden_states=jnp.asarray(
            rng.standard_normal((bsz, 4, cfg.joint_attention_dim)), jnp.float32
        ),
        pooled_projections=jnp.asarray(
            rng.standard_normal((bsz, cfg.pooled_projection_dim)), jnp.float32
        ),
        timestep=jnp.asarray([0.5] * bsz),
        img_ids=jnp.zeros((8, 3)),
        txt_ids=jnp.zeros((4, 3)),
        guidance=jnp.asarray([3.5] * bsz),
    )
    params = model.transformer.init(jax.random.PRNGKey(2), **inputs)["params"]
    # non-trivial adapters: lora_b inits to zero, which would make every
    # lora_a gradient zero and the parity test vacuous
    return jax.tree_util.tree_map_with_path(
        lambda p, v: (
            jnp.asarray(
                np.random.default_rng(7).standard_normal(v.shape) * 0.1, v.dtype
            )
            if p[-1].key == "lora_b"
            else v
        ),
        params,
    )


def train_batch(bsz=4, latent=4, channels=4):
    rng = np.random.default_rng(3)
    cond = jnp.asarray(rng.standard_normal((bsz, latent, latent, channels)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((bsz, latent, latent, channels)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((bsz, latent, latent, channels)), jnp.float32)
    u = jnp.asarray(rng.random((bsz,)), jnp.float32)
    # one zero weight: mesh-padding samples must not perturb the mean
    weights = jnp.asarray([1.0, 1.0, 0.5, 0.0], jnp.float32)[:bsz]
    return cond, target, noise, u, weights


def merge_stage_lora(stage_lora):
    out = {}
    for sub in stage_lora:
        host = jax.device_get(sub)
        for k, v in host.items():
            assert k not in out, k
            out[k] = v
    return out


@pytest.mark.parametrize("n_stages,microbatch", [(2, 2), (4, 1)])
def test_pp_lora_grads_match_monolithic(n_stages, microbatch):
    cfg, model = tiny_model()
    params = init_params(cfg, model)
    base, lora = split_lora_params(params)
    cond, target, noise, u, weights = train_batch()

    def mono_loss(lora):
        loss, _ = model.compute_loss_from_latents(
            merge_params(base, lora), cond, target, noise, u, weights=weights
        )
        return loss

    ref_loss, ref_grads = jax.value_and_grad(mono_loss)(lora)

    pipe = PipelinedFluxTransformer(
        cfg, devices=jax.devices()[:n_stages], lora_rank=RANK, lora_alpha=ALPHA
    )
    trainer = PipelineLoraTrainer(model, pipe, optax.sgd(0.0))
    stage_base, stage_lora = trainer.place_params(params)

    from ragb_vae_tpu.parallel.pipeline import pipelined_lora_loss_and_grads
    from ragb_vae_tpu.models.scheduler import compute_loss_weighting_for_sd3
    from ragb_vae_tpu.ops.packing import pack_latents, prepare_latent_image_ids

    sched = model._train_sched
    n_train = model.scheduler.config.num_train_timesteps
    max_idx = min(len(sched.timesteps) - 1, len(sched.sigmas) - 1)
    indices = jnp.clip((u * n_train).astype(jnp.int32), 0, max_idx)
    timesteps = jnp.asarray(sched.timesteps)[indices]
    sigmas = jnp.asarray(sched.sigmas)[indices].reshape(len(u), 1, 1, 1)
    noisy = (1.0 - sigmas) * target + sigmas * noise
    packed_cond = pack_latents(cond)
    packed = jnp.concatenate([packed_cond, pack_latents(noisy)], axis=1)
    ids_single = prepare_latent_image_ids(target.shape[1] // 2, target.shape[2] // 2)
    bsz = len(u)

    loss, grads = pipelined_lora_loss_and_grads(
        pipe, stage_base, stage_lora,
        hidden_states=packed,
        encoder_hidden_states=jnp.broadcast_to(
            model.prompt_embeds, (bsz,) + model.prompt_embeds.shape[1:]
        ),
        pooled_projections=jnp.broadcast_to(
            model.pooled_prompt_embeds,
            (bsz,) + model.pooled_prompt_embeds.shape[1:],
        ),
        timestep=timesteps / 1000.0,
        img_ids=jnp.concatenate([ids_single, ids_single], axis=0),
        txt_ids=model.text_ids,
        guidance=model._guidance(bsz),
        loss_target=noise - target,
        weighting=compute_loss_weighting_for_sd3(
            sigmas, weighting_scheme="logit_normal"
        ),
        weights=weights,
        seq_cond=packed_cond.shape[1],
        latent_h=target.shape[1],
        latent_w=target.shape[2],
        microbatch=microbatch,
    )

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    got = merge_stage_lora(grads)
    want = jax.device_get(ref_grads)
    assert set(got) == set(want)
    flat_ref = jax.tree_util.tree_leaves(want)
    scale = max(float(np.max(np.abs(x))) for x in flat_ref)
    assert scale > 0, "monolithic grads are all zero — test is vacuous"
    for k in want:
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(want[k]),
            jax.tree_util.tree_leaves_with_path(got[k]),
        ):
            assert pa == pb
            np.testing.assert_allclose(
                b, a, rtol=1e-5, atol=1e-6 * scale, err_msg=f"{k}{pa}"
            )


def test_pp_lora_train_step_matches_monolithic_update():
    cfg, model = tiny_model()
    params = init_params(cfg, model)
    base, lora = split_lora_params(params)
    cond, target, noise, u, weights = train_batch()
    tx = optax.adamw(1e-3)

    def mono_loss(lora):
        loss, _ = model.compute_loss_from_latents(
            merge_params(base, lora), cond, target, noise, u, weights=weights
        )
        return loss

    ref_loss, ref_grads = jax.value_and_grad(mono_loss)(lora)
    opt = tx.init(lora)
    updates, _ = tx.update(ref_grads, opt, lora)
    ref_new = jax.device_get(optax.apply_updates(lora, updates))

    pipe = PipelinedFluxTransformer(
        cfg, devices=jax.devices()[:4], lora_rank=RANK, lora_alpha=ALPHA
    )
    trainer = PipelineLoraTrainer(model, pipe, tx)
    stage_base, stage_lora = trainer.place_params(params)
    opt_states = trainer.init(stage_lora)
    new_lora, new_opt, loss, stats = trainer.step(
        stage_base, stage_lora, opt_states, cond, target, noise, u,
        weights=weights, microbatch=2,
    )

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    got = merge_stage_lora(new_lora)
    # AdamW's g/sqrt(v) normalization is scale-free: the 1e-5-relative fp32
    # noise between the staged and monolithic gradient PROGRAMS maps to
    # ~1e-4..1e-3 relative on the update direction wherever |g| is tiny
    # (observed: 1/512 elements at 2.8e-4). The gradient parity test above
    # is the tight check; here 1e-3 pins the optimizer wiring.
    for k in ref_new:
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_new[k]),
            jax.tree_util.tree_leaves_with_path(got[k]),
        ):
            assert pa == pb
            np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-7, err_msg=f"{k}{pa}")
    assert np.isfinite(float(stats["sigmas_mean"]))
    # a second step runs (opt state threading, jit cache reuse)
    new_lora2, _, loss2, _ = trainer.step(
        stage_base, new_lora, new_opt, cond, target, noise, u,
        weights=weights, microbatch=2,
    )
    assert np.isfinite(float(loss2))


def test_pp_training_rejects_bad_microbatch():
    cfg, model = tiny_model()
    params = init_params(cfg, model)
    cond, target, noise, u, weights = train_batch()
    pipe = PipelinedFluxTransformer(
        cfg, devices=jax.devices()[:2], lora_rank=RANK, lora_alpha=ALPHA
    )
    trainer = PipelineLoraTrainer(model, pipe, optax.sgd(0.1))
    stage_base, stage_lora = trainer.place_params(params)
    opt_states = trainer.init(stage_lora)
    with pytest.raises(ValueError, match="not divisible"):
        trainer.step(
            stage_base, stage_lora, opt_states, cond, target, noise, u,
            weights=weights, microbatch=3,
        )

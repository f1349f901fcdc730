"""FluxTextAlphaModel: loss, sampling, LoRA file round-trips."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ragb_vae_tpu.models.flux_kontext_textalpha import (
    FluxTextAlphaModel,
    load_rgba_vae_from_path,
    read_lora_metadata,
    write_lora_metadata,
)
from ragb_vae_tpu.models.flux_transformer import FluxTransformer2D, FluxTransformerConfig
from ragb_vae_tpu.models.flux_weights import split_lora_params
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.scheduler import FlowMatchEulerScheduler
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.models.weights import save_autoencoder_params


def _build_model(lora_rank=0, lora_alpha=0.0):
    t_cfg = FluxTransformerConfig.tiny()  # in_channels 16 == 4*latent_channels
    vae_cfg = AutoencoderConfig.tiny()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = 32
    vae = RgbaVAE(config=vae_cfg)
    rng = np.random.default_rng(0)
    model = FluxTextAlphaModel(
        transformer_config=t_cfg,
        vae=vae,
        scheduler=FlowMatchEulerScheduler(),
        prompt_embeds=jnp.asarray(rng.standard_normal((1, 4, t_cfg.joint_attention_dim)), jnp.float32),
        pooled_prompt_embeds=jnp.asarray(
            rng.standard_normal((1, t_cfg.pooled_projection_dim)), jnp.float32
        ),
        text_ids=jnp.zeros((4, 3), jnp.float32),
        lora_rank=lora_rank,
        lora_alpha=lora_alpha,
        remat=False,
    )
    return model


@pytest.fixture(scope="module")
def model_params():
    model = _build_model()
    vae_params = model.vae.init_params(jax.random.PRNGKey(0), image_size=32)
    dummy = dict(
        hidden_states=jnp.zeros((1, 8, model.transformer_config.in_channels)),
        encoder_hidden_states=model.prompt_embeds,
        pooled_projections=model.pooled_prompt_embeds,
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((8, 3)),
        txt_ids=model.text_ids,
        guidance=jnp.asarray([3.5]),
    )
    t_params = model.transformer.init(jax.random.PRNGKey(1), **dummy)["params"]
    return model, t_params, vae_params


def _images(batch=2, size=32):
    rng = np.random.default_rng(3)
    return (
        jnp.asarray(rng.random((batch, size, size, 4)), jnp.float32),
        jnp.asarray(rng.random((batch, size, size, 4)), jnp.float32),
    )


def test_compute_loss_finite_and_jittable(model_params):
    model, t_params, vae_params = model_params
    gt, ta = _images()
    loss_fn = jax.jit(model.compute_loss)
    loss, stats = loss_fn(t_params, vae_params, gt, ta, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert 0 < float(stats["sigmas_mean"]) < 1
    assert 0 < float(stats["timesteps_mean"]) <= 1000


def test_compute_loss_grads_flow(model_params):
    model, t_params, vae_params = model_params
    gt, ta = _images(batch=1)
    grads = jax.grad(
        lambda p: model.compute_loss(p, vae_params, gt, ta, jax.random.PRNGKey(0))[0]
    )(t_params)
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
    assert any(n > 0 for n in norms)
    assert all(np.isfinite(n) for n in norms)


def test_sample_shape_range_determinism(model_params):
    model, t_params, vae_params = model_params
    gt, _ = _images(batch=1)
    out1 = model.sample(t_params, vae_params, gt, num_inference_steps=2, key=jax.random.PRNGKey(7))
    out2 = model.sample(t_params, vae_params, gt, num_inference_steps=2, key=jax.random.PRNGKey(7))
    assert out1.shape == gt.shape
    arr = np.asarray(out1)
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    np.testing.assert_array_equal(arr, np.asarray(out2))
    out3 = model.sample(t_params, vae_params, gt, num_inference_steps=2, key=jax.random.PRNGKey(8))
    assert np.abs(np.asarray(out3) - arr).max() > 1e-6


def test_lora_init_save_load_round_trip(model_params, tmp_path):
    base_model, t_params, _ = model_params
    model = _build_model(lora_rank=2, lora_alpha=4.0)
    params = model.init_lora(t_params, jax.random.PRNGKey(5))
    _, lora = split_lora_params(params)
    assert jax.tree_util.tree_leaves(lora), "lora params must exist"

    model.save_lora_weights(params, tmp_path)
    assert (tmp_path / "pytorch_lora_weights.safetensors").exists()
    write_lora_metadata(tmp_path, model_id="tiny", rank=2, lora_alpha=4.0, dtype="float32", step=7)
    meta = read_lora_metadata(tmp_path)
    assert meta["rank"] == 2 and meta["step"] == 7

    reloaded = model.load_lora(t_params, tmp_path)
    flat_a = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(split_lora_params(params)[1])}
    flat_b = {str(p): v for p, v in jax.tree_util.tree_leaves_with_path(split_lora_params(reloaded)[1])}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[k]), np.asarray(flat_b[k]), atol=1e-7)


def test_load_rgba_vae_from_path_widens(tmp_path):
    cfg = AutoencoderConfig.tiny()
    cfg.in_channels = 3
    cfg.out_channels = 3
    vae = RgbaVAE(config=cfg)
    params = vae.init_params(jax.random.PRNGKey(0), image_size=32)
    save_autoencoder_params(cfg, params, tmp_path / "vae")
    model, loaded = load_rgba_vae_from_path(tmp_path / "vae", subfolder="")
    assert model.config.in_channels == 4
    assert model.config.out_channels == 4
    assert np.asarray(loaded["encoder"]["conv_in"]["kernel"]).shape[2] == 4


def test_empty_prompt_cache_round_trip(tmp_path):
    from ragb_vae_tpu.models.flux_kontext_textalpha import (
        encode_empty_prompt,
        save_empty_prompt_embeds,
    )

    prompt = np.random.default_rng(0).standard_normal((1, 8, 32)).astype(np.float32)
    pooled = np.random.default_rng(1).standard_normal((1, 16)).astype(np.float32)
    ids = np.zeros((8, 3), np.float32)
    save_empty_prompt_embeds(tmp_path, prompt, pooled, ids)
    p2, po2, ids2 = encode_empty_prompt(tmp_path)
    np.testing.assert_array_equal(prompt, p2)
    np.testing.assert_array_equal(pooled, po2)
    np.testing.assert_array_equal(ids, ids2)


def test_scheduler_step_requires_set_timesteps():
    """The __init__ schedule has no trailing sigma=0; stepping it would
    silently clamp the final gather into a no-op (regression guard)."""
    import jax.numpy as jnp

    sched = FlowMatchEulerScheduler()
    x = jnp.zeros((1, 4))
    with pytest.raises(ValueError, match="set_timesteps"):
        sched.step(x, 0, x)
    sched.set_timesteps(4, mu=1.0)
    out = sched.step(x, 3, x)  # last index steps onto the appended 0
    assert out.shape == x.shape


def test_latest_complete_lora_checkpoint(tmp_path):
    """auto-resume must skip a crash-truncated (uncommitted) checkpoint."""
    from ragb_vae_tpu.training.flux_kontext_textalpha_lora import (
        latest_complete_lora_checkpoint,
    )

    assert latest_complete_lora_checkpoint(tmp_path / "nope") is None
    root = tmp_path / "ckpts"
    for step, complete in [(3, True), (5, False)]:
        d = root / f"checkpoint-{step}"
        d.mkdir(parents=True)
        (d / "pytorch_lora_weights.safetensors").write_bytes(b"x")
        if complete:
            (d / "train_state.msgpack").write_bytes(b"x")
    picked = latest_complete_lora_checkpoint(root)
    assert picked is not None and picked.name == "checkpoint-3"
    # once step 5's commit marker lands, it wins
    (root / "checkpoint-5" / "train_state.msgpack").write_bytes(b"x")
    assert latest_complete_lora_checkpoint(root).name == "checkpoint-5"

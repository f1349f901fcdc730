"""A reference user's YAML configs run unchanged (key-for-key).

Structural restatements of BOTH shipped reference configs with EVERY key
present (values adapted: tmp paths, tiny models, 2 steps):

- /root/reference/configs/flux_vae.yaml (keys cited per section below)
- /root/reference/configs/flux_kontext_textalpha_lora.yaml

run end-to-end through the same `run_stage` dispatcher `scripts/train.py`
uses. This pins the config-surface contract of MIGRATING.md: torch-only
knobs (num_workers/prefetch_factor/persistent_workers/pin_memory,
deepspeed_config) must be ACCEPTED (mapped or ignored), never fatal, and
every semantic key must actually drive the stage.
"""
import json

import numpy as np
import pytest

import jax

from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.models.weights import save_autoencoder_params
from ragb_vae_tpu.training import run_stage
from tests.data_fixtures import make_components_tree, make_text_alpha_tree


@pytest.fixture(scope="module")
def rgb_ckpt(tmp_path_factory):
    ckpt = tmp_path_factory.mktemp("refcompat") / "flux_rgba_vae_init"
    config = AutoencoderConfig.tiny()
    config.in_channels = 3
    config.out_channels = 3
    model = RgbaVAE(config=config)
    save_autoencoder_params(
        config, model.init_params(jax.random.PRNGKey(0), image_size=32), ckpt
    )
    return ckpt


def test_reference_flux_vae_yaml_runs(rgb_ckpt, tmp_path):
    """configs/flux_vae.yaml restated: every data/training/model key."""
    data_tree = make_components_tree(tmp_path / "components", n_train=8, n_val=4)
    cfg = {
        # data: flux_vae.yaml:1-37 (torch DataLoader knobs included — the
        # loader maps num_workers and must ignore the rest)
        "data": {
            "source": "bucket",
            "bucket_root": str(data_tree),
            "bucket_split": "train",
            "bucket_val_split": "val",
            "bucket_datasets": [
                {
                    "type": "components",
                    "root": str(data_tree),
                    "manifest": str(data_tree / "metadata" / "manifest.json"),
                }
            ],
            "batch_size": 4,
            "num_workers": 2,
            "shuffle": True,
            "interleave_buckets": True,
            "prefetch_factor": 4,
            "persistent_workers": True,
            "pin_memory": True,
            "background_blend_prob": 0.2,
            "background_blend_targets": ["composite"],
            "background_color_range": [0.3, 0.9],
            "background_sample_prob": 0.0,
            "val_shuffle": True,
            "seed": 0,
        },
        # training: flux_vae.yaml:40-69 (+max_steps, our extension, to
        # keep the run CI-sized; deepspeed_config is torch/DeepSpeed-only
        # and must be a no-op here — ZeRO sharding is on by default)
        "training": {
            "stage": "rgba_vae",
            "learning_rate": 1e-5,
            "epochs": 1,
            "max_steps": 2,
            "ckpt_dir": str(tmp_path / "ckpts"),
            "gradient_accumulation_steps": 1,
            "mixed_precision": "no",
            "log_every": 1,
            "run_validation": True,
            "val_every_steps": 0,
            "val_max_batches": 1,
            "val_visual_rows": 2,
            "val_output_dir": str(tmp_path / "val"),
            "val_background_colors": ["white", "black"],
            "ckpt_every_steps": 0,
            "max_grad_norm": 1.0,
            "vae_slicing": True,
            "vae_gradient_checkpointing": True,
            "kl_scale": 1.0e-6,
            "ref_kl_scale": 1.0e-16,
            "lpips_scale": 0.5,  # no lpips_weights -> warn + disable
            "loss_reduce_mean": True,
            "use_naive_mse": False,
            "deepspeed_config": "configs/deepspeed_zero2.json",
            "sample_vis_count": 2,
            "sample_vis_dir": str(tmp_path / "sample_vis"),
            "seed": 0,
        },
        # model: flux_vae.yaml:71-84
        "model": {
            "name": "rgba_vae",
            "base_arch": "flux",
            "beta": 0.25,
            "alpha_loss_weight": 1.0,
            "alpha_l1_weight": 0.0,
            "rgb_loss_weight": 1.0,
            "white_bg_loss_weight": 0.5,
            "black_bg_loss_weight": 0.5,
            "rgb_checkpoint": str(rgb_ckpt),
            "rgb_subfolder": "",
            "ref_rgb_checkpoint": None,
            "ref_rgb_subfolder": None,
            "alpha_bias_init": 0.0,
        },
    }
    metrics = run_stage(cfg)
    assert np.isfinite(metrics["train/loss"])
    assert metrics["global_step"] == 2.0
    assert "val/psnr_white" in metrics and "val/psnr_black" in metrics
    final = tmp_path / "ckpts" / "step_0000002"
    assert (final / "rgba_vae_hf" / "config.json").exists()
    saved = json.loads((final / "rgba_vae_hf" / "config.json").read_text())
    assert saved["in_channels"] == 4  # widened, reference semantics
    assert list((tmp_path / "sample_vis").glob("*.png"))  # sample_vis_count


def test_reference_lora_yaml_runs(tmp_path, monkeypatch):
    """configs/flux_kontext_textalpha_lora.yaml restated: every key,
    including the ${env:HUGGING_FACE_HUB_TOKEN} expansion."""
    from ragb_vae_tpu.models.flux_transformer import (
        FluxTransformer2D,
        FluxTransformerConfig,
    )
    from ragb_vae_tpu.models.flux_weights import save_flux_transformer_params

    import jax.numpy as jnp

    monkeypatch.setenv("HUGGING_FACE_HUB_TOKEN", "hf_dummy_for_compat_test")

    # tiny HF-layout FLUX checkpoint (transformer + scheduler + prompt
    # cache + RGBA VAE), mirroring the reference's on-disk expectations
    root = tmp_path / "flux_tiny"
    t_cfg = FluxTransformerConfig.tiny()
    tr = FluxTransformer2D(t_cfg)
    dummy = dict(
        hidden_states=jnp.zeros((1, 4, t_cfg.in_channels)),
        encoder_hidden_states=jnp.zeros((1, 2, t_cfg.joint_attention_dim)),
        pooled_projections=jnp.zeros((1, t_cfg.pooled_projection_dim)),
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((4, 3)),
        txt_ids=jnp.zeros((2, 3)),
        guidance=jnp.asarray([3.5]),
    )
    save_flux_transformer_params(
        t_cfg, tr.init(jax.random.PRNGKey(0), **dummy)["params"], root / "transformer"
    )
    (root / "scheduler").mkdir(parents=True)
    (root / "scheduler" / "scheduler_config.json").write_text(
        json.dumps(
            {"num_train_timesteps": 1000, "shift": 3.0, "use_dynamic_shifting": True}
        )
    )
    rng = np.random.default_rng(0)
    np.savez(
        root / "empty_prompt_embeds.npz",
        prompt_embeds=rng.standard_normal((1, 4, t_cfg.joint_attention_dim)).astype(
            np.float32
        ),
        pooled_prompt_embeds=rng.standard_normal(
            (1, t_cfg.pooled_projection_dim)
        ).astype(np.float32),
        text_ids=np.zeros((4, 3), np.float32),
    )
    vae_cfg = AutoencoderConfig.tiny()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = 64
    vae = RgbaVAE(config=vae_cfg)
    save_autoencoder_params(
        vae_cfg, vae.init_params(jax.random.PRNGKey(1), image_size=32), root / "vae"
    )
    data_root = make_text_alpha_tree(tmp_path / "text_alpha", n=4)

    cfg = {
        # model: flux_kontext_textalpha_lora.yaml:1-5
        "model": {
            "pretrained_model_name_or_path": str(root),
            "hf_token": "${env:HUGGING_FACE_HUB_TOKEN}",
            "rgba_vae_path": str(root / "vae"),
            "vae_subfolder": "",
        },
        # data: :7-14 (val_split points at the same tree's train split —
        # key acceptance is the contract, the fixture has one split)
        "data": {
            "root": str(data_root),
            "train_split": "train",
            "val_split": "train",
            "batch_size": 2,
            "val_batch_size": 1,
            "num_workers": 2,
            "drop_last": True,
            "interleave_buckets": True,
        },
        # training: :16-40
        "training": {
            "stage": "kontext_textalpha_lora",
            "mixed_precision": "no",
            "grad_accum_steps": 1,
            "learning_rate": 3.0e-5,
            "weight_decay": 0.01,
            "adam_beta1": 0.9,
            "adam_beta2": 0.95,
            "adam_eps": 1.0e-8,
            "max_train_steps": 2,
            "log_every": 1,
            "save_every": 2,
            "ckpt_every_steps": 2,
            "ckpt_dir": str(tmp_path / "lora_ckpt"),
            "output_dir": str(tmp_path / "lora_out"),
            "val_output_dir": str(tmp_path / "lora_val"),
            "val_every": 0,
            "val_max_samples": 1,
            "val_num_inference_steps": 1,
            "run_validation_on_start": False,
            "rank": 4,
            "lora_alpha": 8,
            "max_grad_norm": 1.0,
            "deepspeed_config": "configs/deepspeed_zero2.json",
            "seed": 0,
        },
    }
    run_stage(cfg)
    final = tmp_path / "lora_ckpt" / "final"
    assert (final / "pytorch_lora_weights.safetensors").exists()
    meta = json.loads((final / "metadata.json").read_text())
    assert meta["rank"] == 4 and meta["step"] == 2

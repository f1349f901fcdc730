"""End-to-end LoRA training stage + inference CLI tests (tiny models)."""
import json
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from ragb_vae_tpu.models.flux_transformer import FluxTransformer2D, FluxTransformerConfig
from ragb_vae_tpu.models.flux_weights import save_flux_transformer_params
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.models.weights import save_autoencoder_params
from ragb_vae_tpu.training.flux_kontext_textalpha_lora import (
    build_args_from_cfg,
    train_from_config,
)
from tests.data_fixtures import make_text_alpha_tree


@pytest.fixture(scope="module")
def pretrained_dir(tmp_path_factory):
    """A local HF-layout FLUX checkpoint dir with tiny weights."""
    root = tmp_path_factory.mktemp("flux") / "flux_tiny"
    t_cfg = FluxTransformerConfig.tiny()
    model = FluxTransformer2D(t_cfg)
    import jax.numpy as jnp

    dummy = dict(
        hidden_states=jnp.zeros((1, 4, t_cfg.in_channels)),
        encoder_hidden_states=jnp.zeros((1, 2, t_cfg.joint_attention_dim)),
        pooled_projections=jnp.zeros((1, t_cfg.pooled_projection_dim)),
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((4, 3)),
        txt_ids=jnp.zeros((2, 3)),
        guidance=jnp.asarray([3.5]),
    )
    params = model.init(jax.random.PRNGKey(0), **dummy)["params"]
    save_flux_transformer_params(t_cfg, params, root / "transformer")

    (root / "scheduler").mkdir(parents=True)
    (root / "scheduler" / "scheduler_config.json").write_text(
        json.dumps({"num_train_timesteps": 1000, "shift": 3.0, "use_dynamic_shifting": True})
    )
    rng = np.random.default_rng(0)
    np.savez(
        root / "empty_prompt_embeds.npz",
        prompt_embeds=rng.standard_normal((1, 4, t_cfg.joint_attention_dim)).astype(np.float32),
        pooled_prompt_embeds=rng.standard_normal((1, t_cfg.pooled_projection_dim)).astype(np.float32),
        text_ids=np.zeros((4, 3), np.float32),
    )

    # tiny RGBA VAE (sample_size 64 keeps the train-time mu sane)
    vae_cfg = AutoencoderConfig.tiny()
    vae_cfg.in_channels = 4
    vae_cfg.out_channels = 4
    vae_cfg.sample_size = 64
    vae = RgbaVAE(config=vae_cfg)
    vae_params = vae.init_params(jax.random.PRNGKey(1), image_size=32)
    save_autoencoder_params(vae_cfg, vae_params, root / "vae")
    return root


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ta") / "text_alpha"
    return make_text_alpha_tree(root, n=8)


def _cfg(pretrained_dir, data_root, out, **train_overrides):
    training = {
        "stage": "kontext_textalpha_lora",
        "mixed_precision": "no",
        "learning_rate": 1e-3,
        "max_train_steps": 2,
        "rank": 2,
        "lora_alpha": 4,
        "log_every": 1,
        "save_every": 0,
        "ckpt_dir": str(out / "ckpts"),
        "val_every": 0,
        "val_output_dir": str(out / "val"),
        "val_num_inference_steps": 1,
        "seed": 0,
    }
    training.update(train_overrides)
    return {
        "model": {
            "pretrained_model_name_or_path": str(pretrained_dir),
            "rgba_vae_path": str(pretrained_dir / "vae"),
            "vae_subfolder": "",
        },
        "data": {"root": str(data_root), "train_split": "train", "batch_size": 4,
                 "num_workers": 0},
        "training": training,
    }


def test_build_args_from_cfg_synonyms(pretrained_dir, data_root, tmp_path):
    cfg = _cfg(pretrained_dir, data_root, tmp_path)
    cfg["training"]["ckpt_every_steps"] = 123
    cfg["training"]["val_every_steps"] = 77
    cfg["training"]["val_max_batches"] = 5
    cfg["data"]["val_batch_size"] = 2
    args = build_args_from_cfg(cfg)
    assert args.save_every == 123
    assert args.val_every == 77
    assert args.val_max_samples == 10
    assert args.rank == 2 and args.lora_alpha == 4

    bad = _cfg(pretrained_dir, data_root, tmp_path)
    del bad["model"]["rgba_vae_path"]
    with pytest.raises(ValueError, match="rgba_vae_path"):
        build_args_from_cfg(bad)


def test_lora_train_end_to_end(pretrained_dir, data_root, tmp_path):
    cfg = _cfg(pretrained_dir, data_root, tmp_path)
    metrics = train_from_config(cfg)
    assert metrics["global_step"] == 2.0
    assert np.isfinite(metrics["train/loss"])
    final = tmp_path / "ckpts" / "final"
    assert (final / "pytorch_lora_weights.safetensors").exists()
    meta = json.loads((final / "metadata.json").read_text())
    assert meta["rank"] == 2 and meta["step"] == 2


def test_lora_train_with_validation(pretrained_dir, data_root, tmp_path):
    cfg = _cfg(
        pretrained_dir,
        data_root,
        tmp_path,
        max_train_steps=1,
        run_validation_on_start=True,
    )
    cfg["data"]["val_split"] = "train"  # fixture has train split only
    cfg["data"]["val_batch_size"] = 1
    cfg["training"]["val_max_samples"] = 1
    train_from_config(cfg)
    pairs = list((tmp_path / "val" / "step-start").glob("*_pair.png"))
    assert len(pairs) == 1


def test_inference_cli(pretrained_dir, tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    inp = tmp_path / "in.png"
    Image.fromarray(rng.integers(0, 256, (64, 64, 4), dtype=np.uint8), "RGBA").save(inp)
    out = tmp_path / "out.png"

    lora_dir = tmp_path / "lora"
    # train one step to produce LoRA weights + metadata
    cfg = _cfg(pretrained_dir, tmp_path / "d", tmp_path, max_train_steps=1)
    cfg["data"]["root"] = str(make_text_alpha_tree(tmp_path / "d", n=2))
    cfg["training"]["ckpt_dir"] = str(lora_dir)
    train_from_config(cfg)

    env = {"JAX_PLATFORMS": "cpu", "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    import os

    result = subprocess.run(
        [
            sys.executable,
            str(Path(__file__).resolve().parent.parent / "inference_rgba_flux.py"),
            "--pretrained_model_name_or_path", str(pretrained_dir),
            "--rgba_vae_path", str(pretrained_dir / "vae"),
            "--vae_subfolder", "",
            "--lora_path", str(lora_dir / "final"),
            "--input_image", str(inp),
            "--output_path", str(out),
            "--steps", "1",
            "--seed", "0",
            "--precision", "fp32",
        ],
        capture_output=True,
        text=True,
        env={**os.environ, **env},
        timeout=1200,  # generous: 1-core box, often shared with background jobs
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert out.exists()
    arr = np.asarray(Image.open(out))
    assert arr.shape == (64, 64, 4)


def test_inference_cli_tp(pretrained_dir, tmp_path):
    """--tp N: Megatron-sharded transformer through the CLI (no LoRA)."""
    from PIL import Image

    rng = np.random.default_rng(4)
    inp = tmp_path / "in.png"
    Image.fromarray(rng.integers(0, 256, (64, 64, 4), dtype=np.uint8), "RGBA").save(inp)
    out = tmp_path / "out_tp.png"

    env = {"JAX_PLATFORMS": "cpu", "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    import os

    result = subprocess.run(
        [
            sys.executable,
            str(Path(__file__).resolve().parent.parent / "inference_rgba_flux.py"),
            "--pretrained_model_name_or_path", str(pretrained_dir),
            "--rgba_vae_path", str(pretrained_dir / "vae"),
            "--vae_subfolder", "",
            "--input_image", str(inp),
            "--output_path", str(out),
            "--steps", "1",
            "--seed", "0",
            "--precision", "fp32",
            "--tp", "2",
        ],
        capture_output=True,
        text=True,
        env={**os.environ, **env},
        timeout=1200,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    arr = np.asarray(Image.open(out))
    assert arr.shape == (64, 64, 4)


def test_inference_cli_pp(pretrained_dir, tmp_path):
    """--pp N: pipeline-staged transformer through the CLI (no LoRA)."""
    from PIL import Image

    rng = np.random.default_rng(5)
    inp = tmp_path / "in.png"
    Image.fromarray(rng.integers(0, 256, (64, 64, 4), dtype=np.uint8), "RGBA").save(inp)
    out = tmp_path / "out_pp.png"

    env = {"JAX_PLATFORMS": "cpu", "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    import os

    result = subprocess.run(
        [
            sys.executable,
            str(Path(__file__).resolve().parent.parent / "inference_rgba_flux.py"),
            "--pretrained_model_name_or_path", str(pretrained_dir),
            "--rgba_vae_path", str(pretrained_dir / "vae"),
            "--vae_subfolder", "",
            "--input_image", str(inp),
            "--output_path", str(out),
            "--steps", "1",
            "--seed", "0",
            "--precision", "fp32",
            "--pp", "2",
        ],
        capture_output=True,
        text=True,
        env={**os.environ, **env},
        timeout=1200,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    arr = np.asarray(Image.open(out))
    assert arr.shape == (64, 64, 4)


def test_serving_daemon_build_server_pp(pretrained_dir):
    """build_server wires --pp through the shared bootstrap
    (parallel/bootstrap.py): a pipelined InferenceServer that actually
    answers a request end-to-end; the unsharded param tree is released."""
    from ragb_vae_tpu.serving_daemon import build_server, parse_args

    args = parse_args(
        [
            "--pretrained_model_name_or_path", str(pretrained_dir),
            "--rgba_vae_path", str(pretrained_dir / "vae"),
            "--vae_subfolder", "",
            "--precision", "fp32",
            "--steps", "1",
            "--max-batch", "2",
            "--max-delay-ms", "10",
            "--pp", "2",
            "--compilation-cache", "off",
        ]
    )
    server = build_server(args)
    assert server._pipe is not None and server._pipe.n_stages == 2
    assert server.t_params is None  # only the staged copies stay resident
    rng = np.random.default_rng(0)
    with server:
        fut = server.submit(rng.random((64, 64, 4)).astype(np.float32), seed=1)
        out = fut.result(timeout=600)
    assert out.shape == (64, 64, 4)
    assert np.isfinite(out).all()


def test_inference_resolve_inputs(tmp_path):
    from PIL import Image

    from ragb_vae_tpu.inference import _resolve_inputs

    rng = np.random.default_rng(1)
    d = tmp_path / "imgs"
    d.mkdir()
    for name in ("a.png", "b.png", "c.webp", "skip.txt"):
        if name.endswith(".txt"):
            (d / name).write_text("x")
        else:
            Image.fromarray(
                rng.integers(0, 256, (16, 16, 4), dtype=np.uint8), "RGBA"
            ).save(d / name)
    single = _resolve_inputs(str(d / "a.png"))
    assert [p.name for p in single] == ["a.png"]
    from_dir = _resolve_inputs(str(d))
    assert [p.name for p in from_dir] == ["a.png", "b.png", "c.webp"]
    from_glob = _resolve_inputs(str(d / "*.png"))
    assert [p.name for p in from_glob] == ["a.png", "b.png"]
    with pytest.raises(FileNotFoundError):
        _resolve_inputs(str(d / "nope*.png"))


def test_inference_cli_batch_mode(pretrained_dir, tmp_path):
    """Directory input -> batched sampling, grouped by image size."""
    from PIL import Image

    rng = np.random.default_rng(0)
    in_dir = tmp_path / "inputs"
    in_dir.mkdir()
    for i in range(3):  # two 64x64 + one 32x32: exercises size grouping
        size = 64 if i < 2 else 32
        Image.fromarray(
            rng.integers(0, 256, (size, size, 4), dtype=np.uint8), "RGBA"
        ).save(in_dir / f"img{i}.png")
    out_dir = tmp_path / "outs"

    env = {"JAX_PLATFORMS": "cpu", "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    import os

    result = subprocess.run(
        [
            sys.executable,
            str(Path(__file__).resolve().parent.parent / "inference_rgba_flux.py"),
            "--pretrained_model_name_or_path", str(pretrained_dir),
            "--rgba_vae_path", str(pretrained_dir / "vae"),
            "--vae_subfolder", "",
            "--input_image", str(in_dir),
            "--output_path", str(out_dir),
            "--batch_size", "2",
            "--steps", "1",
            "--seed", "0",
            "--precision", "fp32",
        ],
        capture_output=True,
        text=True,
        env={**os.environ, **env},
        timeout=1200,  # generous: 1-core box, often shared with background jobs
    )
    assert result.returncode == 0, result.stderr[-2000:]
    outs = sorted(p.name for p in out_dir.glob("*.png"))
    assert outs == [
        "img0_text_alpha.png", "img1_text_alpha.png", "img2_text_alpha.png"
    ]
    big = np.asarray(Image.open(out_dir / "img0_text_alpha.png"))
    small = np.asarray(Image.open(out_dir / "img2_text_alpha.png"))
    assert big.shape == (64, 64, 4) and small.shape == (32, 32, 4)


def test_lora_resume_continues_run(pretrained_dir, data_root, tmp_path):
    """Kill/restart: a 2-step run then resume-for-2-more matches one 4-step
    run's step counter, and adapter+optimizer state round-trip the restart."""
    # uninterrupted 4-step run
    cfg_full = _cfg(pretrained_dir, data_root, tmp_path / "full", max_train_steps=4)
    m_full = train_from_config(cfg_full)
    assert m_full["global_step"] == 4.0

    # interrupted: 2 steps, checkpoint, then resume to 4
    cfg_a = _cfg(pretrained_dir, data_root, tmp_path / "split", max_train_steps=2,
                 save_every=2)
    train_from_config(cfg_a)
    ckpt = tmp_path / "split" / "ckpts" / "checkpoint-2"
    assert (ckpt / "pytorch_lora_weights.safetensors").exists()
    assert (ckpt / "train_state.msgpack").exists()

    cfg_b = _cfg(pretrained_dir, data_root, tmp_path / "split", max_train_steps=4,
                 resume_from="auto", save_every=2)
    m_b = train_from_config(cfg_b)
    assert m_b["global_step"] == 4.0
    assert np.isfinite(m_b["train/loss"])

    # resumed run produced the later checkpoint too
    assert (tmp_path / "split" / "ckpts" / "checkpoint-4" / "train_state.msgpack").exists()

    # optimizer state actually restored: the resumed final adapters differ
    # from the step-2 adapters (training continued, not restarted at step 0)
    from ragb_vae_tpu.models.weights import load_torch_state

    w2 = load_torch_state(ckpt / "pytorch_lora_weights.safetensors")
    w4 = load_torch_state(
        tmp_path / "split" / "ckpts" / "final" / "pytorch_lora_weights.safetensors"
    )
    diffs = [np.abs(np.asarray(w4[k]) - np.asarray(w2[k])).max() for k in w2]
    assert max(diffs) > 0.0


def test_lora_train_with_fsdp_base(pretrained_dir, data_root, tmp_path):
    """FSDP-sharded frozen base (GSPMD all-gathers) trains identically."""
    cfg = _cfg(pretrained_dir, data_root, tmp_path / "rep", max_train_steps=1)
    m_rep = train_from_config(cfg)

    cfg2 = _cfg(pretrained_dir, data_root, tmp_path / "fsdp", max_train_steps=1)
    cfg2["training"]["shard_base_params"] = True
    m_fsdp = train_from_config(cfg2)

    assert np.isfinite(m_fsdp["train/loss"])
    # same data order + same RNG -> identical loss up to fp reassociation
    assert abs(m_fsdp["train/loss"] - m_rep["train/loss"]) < 1e-3


def test_lora_train_with_tensor_parallel_base(pretrained_dir, data_root, tmp_path):
    """training.tensor_parallel: Megatron-sharded frozen base over a
    (data, model) mesh trains identically to the replicated run (the specs
    are pinned at grads level in test_dp_tp_training; this drives the full
    config surface: YAML -> stage -> sharded step -> peft save)."""
    cfg = _cfg(pretrained_dir, data_root, tmp_path / "rep", max_train_steps=1)
    m_rep = train_from_config(cfg)

    cfg2 = _cfg(pretrained_dir, data_root, tmp_path / "tp", max_train_steps=1)
    cfg2["training"]["tensor_parallel"] = 2
    m_tp = train_from_config(cfg2)

    assert np.isfinite(m_tp["train/loss"])
    assert abs(m_tp["train/loss"] - m_rep["train/loss"]) < 1e-3
    final = tmp_path / "tp" / "ckpts" / "final"
    assert (final / "pytorch_lora_weights.safetensors").exists()

    # tp + FSDP on the same base is a config error, not a silent pick
    cfg3 = _cfg(pretrained_dir, data_root, tmp_path / "bad", max_train_steps=1)
    cfg3["training"]["tensor_parallel"] = 2
    cfg3["training"]["shard_base_params"] = True
    with pytest.raises(ValueError, match="mutually exclusive"):
        train_from_config(cfg3)

    # composed tp x sp: (data=2, model=2, sp=2) mesh, same loss
    cfg4 = _cfg(pretrained_dir, data_root, tmp_path / "tpsp", max_train_steps=1)
    cfg4["training"]["tensor_parallel"] = 2
    cfg4["training"]["sequence_parallel"] = 2
    m_tpsp = train_from_config(cfg4)
    assert abs(m_tpsp["train/loss"] - m_rep["train/loss"]) < 1e-3


def test_lora_train_qlora_int8_base(pretrained_dir, data_root, tmp_path):
    """QLoRA-style: frozen base in weight-only int8, fp32 adapters train.

    Full-scale FLUX.1 LoRA fits one 16 GB chip this way (~11.1 GiB base
    vs 22.2 GiB bf16); here the tiny config pins the mechanics — training
    runs, the loss is finite, adapters save, and the base tree really is
    int8."""
    cfg = _cfg(pretrained_dir, data_root, tmp_path, weight_quant="int8")
    metrics = train_from_config(cfg)
    assert metrics["global_step"] == 2.0
    assert np.isfinite(metrics["train/loss"])
    final = tmp_path / "ckpts" / "final"
    assert (final / "pytorch_lora_weights.safetensors").exists()

    # the saved adapters load back onto a quantized base for inference
    from ragb_vae_tpu.models.flux_kontext_textalpha import FluxTextAlphaModel

    model, t_params, vae_params = FluxTextAlphaModel.from_pretrained(
        str(pretrained_dir),
        vae_path=str(pretrained_dir / "vae"),
        vae_subfolder="",
        lora_rank=2,
        lora_alpha=4.0,
        weight_quant="int8",
    )
    t_params = model.load_lora(t_params, final)
    leaves = {p[-1].key for p, _ in jax.tree_util.tree_leaves_with_path(t_params)}
    assert "kernel_q" in leaves and "lora_a" in leaves
    import jax.numpy as jnp

    gt = jnp.asarray(np.random.default_rng(0).random((1, 32, 32, 4)), jnp.float32)
    out = model.sample(t_params, vae_params, gt, num_inference_steps=1,
                       key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()

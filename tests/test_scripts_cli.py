"""Subprocess tests for the converter / sanity-check CLIs."""
import json
import os
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.models.weights import load_autoencoder_params, save_autoencoder_params

REPO = Path(__file__).resolve().parent.parent
ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


def _run(args, timeout=600):
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True, env=ENV, timeout=timeout
    )


@pytest.fixture(scope="module")
def rgb_ckpt(tmp_path_factory):
    ckpt = tmp_path_factory.mktemp("rgb") / "src" / "vae"
    cfg = AutoencoderConfig.tiny()
    cfg.in_channels = 3
    cfg.out_channels = 3
    model = RgbaVAE(config=cfg)
    params = model.init_params(jax.random.PRNGKey(0), image_size=32)
    save_autoencoder_params(cfg, params, ckpt)
    return ckpt.parent  # the --source dir containing the 'vae' subfolder


def test_convert_qwen_vae_to_rgba_cli(rgb_ckpt, tmp_path):
    out_dir = tmp_path / "rgba"
    result = _run(
        [
            str(REPO / "scripts" / "convert_qwen_vae_to_rgba.py"),
            "--source", str(rgb_ckpt),
            "--arch", "qwen",
            "--output-dir", str(out_dir),
        ]
    )
    assert result.returncode == 0, result.stderr[-2000:]
    cfg = json.loads((out_dir / "config.json").read_text())
    assert cfg["in_channels"] == 4 and cfg["out_channels"] == 4
    config, params = load_autoencoder_params(out_dir)
    kernel = np.asarray(params["encoder"]["conv_in"]["kernel"])
    assert kernel.shape[2] == 4
    # alpha input path zero-initialized
    np.testing.assert_array_equal(kernel[:, :, 3, :], 0.0)


def test_prepare_rgba_vae_init_cli(rgb_ckpt, tmp_path):
    out_dir = tmp_path / "init"
    result = _run(
        [
            str(REPO / "scripts" / "prepare_rgba_vae_init.py"),
            "--source", str(rgb_ckpt),
            "--arch", "qwen",
            "--alpha-bias-init", "0.5",
            "--output-dir", str(out_dir),
        ]
    )
    assert result.returncode == 0, result.stderr[-2000:]
    _, params = load_autoencoder_params(out_dir)
    bias = np.asarray(params["decoder"]["conv_out"]["bias"])
    assert bias.shape[0] == 4
    assert bias[3] == pytest.approx(0.5)


def test_rgb_vae_sanity_check_cli(rgb_ckpt, tmp_path):
    from PIL import Image

    img = tmp_path / "in.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8), "RGB").save(img)
    out = tmp_path / "grid.png"
    result = _run(
        [
            str(REPO / "scripts" / "rgb_vae_sanity_check.py"),
            "--rgb-vae", str(rgb_ckpt),
            "--vae-subfolder", "vae",
            "--image", str(img),
            "--output", str(out),
        ]
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert out.exists()
    arr = np.asarray(Image.open(out))
    assert arr.shape[1] == 64  # GT | recon side by side


def test_dataset_sanity_check_cli(tmp_path):
    from tests.data_fixtures import make_multilayer_tree

    rendered = tmp_path / "rendered"
    json_root = tmp_path / "json"
    make_multilayer_tree(rendered, json_root, n=2)
    result = _run(
        [
            str(REPO / "scripts" / "dataset_sanity_check.py"),
            "--rendered-root", str(rendered),
            "--json-root", str(json_root),
            "--max-samples", "2",
            "--vae-checkpoint", str(tmp_path / "missing"),  # skip recon part
        ]
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Batch keys:" in result.stdout
    assert "composite:" in result.stdout

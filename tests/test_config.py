"""Config loading, env expansion, dtype mapping, stage dispatch."""
import pytest

from ragb_vae_tpu.config import dtype_from_str, load_config, resolve_env
from ragb_vae_tpu.training import run_stage, train_decomposition, train_refine


def test_resolve_env_expansion(monkeypatch):
    monkeypatch.setenv("MY_TOKEN", "sekrit")
    cfg = {"a": "${env:MY_TOKEN}", "b": ["${env:MY_TOKEN}", 3], "c": {"d": "plain"}}
    out = resolve_env(cfg)
    assert out == {"a": "sekrit", "b": ["sekrit", 3], "c": {"d": "plain"}}


def test_resolve_env_missing_raises(monkeypatch):
    monkeypatch.delenv("NOPE_VAR", raising=False)
    with pytest.raises(ValueError, match="NOPE_VAR"):
        resolve_env("${env:NOPE_VAR}")


def test_load_config_yaml(tmp_path, monkeypatch):
    monkeypatch.setenv("CKPT", "/ckpts/init")
    path = tmp_path / "cfg.yaml"
    path.write_text(
        "training:\n  stage: rgba_vae\n  learning_rate: 1e-5\nmodel:\n  rgb_checkpoint: ${env:CKPT}\n"
    )
    cfg = load_config(path)
    assert cfg["training"]["stage"] == "rgba_vae"
    assert cfg["model"]["rgb_checkpoint"] == "/ckpts/init"


def test_load_config_rejects_non_mapping(tmp_path):
    path = tmp_path / "bad.yaml"
    path.write_text("- just\n- a\n- list\n")
    with pytest.raises(ValueError, match="mapping"):
        load_config(path)


def test_dtype_from_str():
    import jax.numpy as jnp

    assert dtype_from_str("bfloat16") == jnp.bfloat16
    assert dtype_from_str("bf16") == jnp.bfloat16
    assert dtype_from_str("float32") == jnp.float32
    assert dtype_from_str(None) == jnp.float32
    with pytest.raises(ValueError):
        dtype_from_str("int7")


def test_placeholder_stages_raise():
    with pytest.raises(NotImplementedError):
        train_decomposition({})
    with pytest.raises(NotImplementedError):
        train_refine({})
    with pytest.raises(NotImplementedError):
        run_stage({"training": {"stage": "decompose"}})
    with pytest.raises(ValueError, match="Unknown training stage"):
        run_stage({"training": {"stage": "nope"}})

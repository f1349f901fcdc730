"""Persistent XLA compilation cache (utils/compilation_cache.py).

Beyond-parity: the reference re-pays full model warmup on every process
start (inference_rgba_flux.py / scripts/train.py have no compile caching
— torch eager). Here every CLI entry point points JAX's content-addressed
persistent cache at a shared directory, so restarted daemons and resumed
(or preempted, see test_preemption.py) training runs skip recompilation.
"""
import os

import jax
import jax.numpy as jnp
import pytest

from ragb_vae_tpu.utils.compilation_cache import (
    default_cache_dir,
    enable_compilation_cache,
    resolve_cache_dir,
)


def test_resolve_off_values():
    for v in (False, "off", "OFF", "false", "0", "none", "disabled"):
        assert resolve_cache_dir(v) is None, v


def test_resolve_auto_values(monkeypatch):
    monkeypatch.delenv("RAGB_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.delenv("RAGB_NO_COMPILATION_CACHE", raising=False)
    for v in (None, True, "", "auto", "on", "true", "default"):
        assert resolve_cache_dir(v) == default_cache_dir(), v
    assert default_cache_dir().endswith(os.path.join("ragb_vae_tpu", "xla_cache"))


def test_resolve_explicit_dir_and_env(monkeypatch):
    assert resolve_cache_dir("/some/dir") == "/some/dir"
    monkeypatch.setenv("RAGB_COMPILATION_CACHE_DIR", "/env/dir")
    assert resolve_cache_dir("auto") == "/env/dir"
    # explicit path still wins over the env default
    assert resolve_cache_dir("/some/dir") == "/some/dir"


def test_kill_switch_wins(monkeypatch):
    monkeypatch.setenv("RAGB_NO_COMPILATION_CACHE", "1")
    assert resolve_cache_dir("auto") is None
    assert resolve_cache_dir("/some/dir") is None
    assert enable_compilation_cache("/some/dir") is None


@pytest.fixture
def restore_jax_cache_config():
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)


def test_cache_populates_on_compile(tmp_path, restore_jax_cache_config, monkeypatch):
    monkeypatch.delenv("RAGB_NO_COMPILATION_CACHE", raising=False)
    cache = tmp_path / "xla"
    got = enable_compilation_cache(str(cache), min_compile_time_secs=0.0)
    assert got == str(cache) and cache.is_dir()

    @jax.jit
    def f(x):
        return jnp.tanh(x) @ x.T + 3.25

    f(jnp.ones((64, 64))).block_until_ready()
    entries = list(cache.iterdir())
    assert entries, "persistent cache wrote no entries after a jit compile"

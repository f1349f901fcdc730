"""Persistent XLA compilation cache for the CLI surfaces.

Full-scale FLUX.1 sampling programs take minutes to compile on TPU (the
serving daemon's --warmup flag exists for exactly that reason); the
persistent compilation cache makes every compile after the first process
lifetime a disk hit instead. JAX's cache is content-addressed over
(HLO, compile options, backend version), so it is always safe to share
one directory across runs, configs, and even branches.

Beyond-parity: the torch reference re-pays full eager-mode warmup on
every process start (inference_rgba_flux.py has no caching of any kind);
here a restarted daemon or a re-launched training job skips straight to
execution.

Policy: the cache is enabled by default on every CLI entry point
(train/infer/serve) and NOT at import time of the library — tests and
embedding applications keep full control of jax.config. Opt out with
`RAGB_NO_COMPILATION_CACHE=1`, `--compilation-cache off`, or
`training.compilation_cache: false`.
"""
from __future__ import annotations

import os
from typing import Optional, Union

_OFF_VALUES = {"off", "false", "0", "none", "disabled"}
_AUTO_VALUES = {None, True, "", "auto", "true", "on", "1", "default"}


def default_cache_dir() -> str:
    """`$RAGB_COMPILATION_CACHE_DIR`, else `~/.cache/ragb_vae_tpu/xla_cache`."""
    env = os.environ.get("RAGB_COMPILATION_CACHE_DIR")
    if env:
        return env
    return os.path.join(
        os.path.expanduser("~"), ".cache", "ragb_vae_tpu", "xla_cache"
    )


def resolve_cache_dir(setting: Union[None, bool, str]) -> Optional[str]:
    """Map a config/CLI setting to a cache directory (None = disabled).

    Accepts: None/True/"auto"/"on" (-> default dir), False/"off"/"none"
    (-> disabled), or an explicit directory path. The kill switch
    `RAGB_NO_COMPILATION_CACHE=1` wins over everything (e.g. when an
    outer harness manages jax.config itself).
    """
    if os.environ.get("RAGB_NO_COMPILATION_CACHE") == "1":
        return None
    if setting is False:
        return None
    if isinstance(setting, str) and setting.strip().lower() in _OFF_VALUES:
        return None
    if setting in _AUTO_VALUES or (
        isinstance(setting, str) and setting.strip().lower() in _AUTO_VALUES
    ):
        return default_cache_dir()
    return str(setting)


def enable_compilation_cache(
    setting: Union[None, bool, str] = None,
    *,
    min_compile_time_secs: Optional[float] = None,
) -> Optional[str]:
    """Point JAX's persistent compilation cache at a directory.

    Returns the directory in use, or None when disabled. Call BEFORE the
    first jit compile of the process (entries compiled earlier are simply
    not cached — nothing breaks). `min_compile_time_secs` overrides JAX's
    default (1 s): only compiles at least this slow are persisted, which
    keeps tiny utility jits from churning the directory.
    """
    cache_dir = resolve_cache_dir(setting)
    if cache_dir is None:
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    if min_compile_time_secs is not None:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(min_compile_time_secs),
        )
    return cache_dir

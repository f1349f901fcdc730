"""YAML config loading with `${env:VAR}` expansion.

Parity with the reference config system (SURVEY.md §5.6): nested
`{data, training, model}` dicts loaded via yaml.safe_load
(scripts/train.py:28-29) and recursive environment-variable substitution
(flux_kontext_textalpha_lora.py:35-45).
"""
from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Dict, Union

import yaml

_ENV_PATTERN = re.compile(r"\$\{env:([A-Za-z_][A-Za-z0-9_]*)\}")


def resolve_env(value: Any) -> Any:
    """Recursively expand `${env:VAR}` in strings; error on unset vars."""
    if isinstance(value, str):
        def repl(match: "re.Match[str]") -> str:
            name = match.group(1)
            resolved = os.environ.get(name)
            if resolved is None:
                raise ValueError(f"Environment variable '{name}' required by config is not set.")
            return resolved

        return _ENV_PATTERN.sub(repl, value)
    if isinstance(value, dict):
        return {k: resolve_env(v) for k, v in value.items()}
    if isinstance(value, list):
        return [resolve_env(v) for v in value]
    return value


def load_config(path: Union[str, Path]) -> Dict[str, Any]:
    with Path(path).open("r", encoding="utf-8") as f:
        cfg = yaml.safe_load(f)
    if not isinstance(cfg, dict):
        raise ValueError(f"Config {path} must be a mapping, got {type(cfg).__name__}.")
    return resolve_env(cfg)


def dtype_from_str(name: Any):
    """Map config dtype strings to jnp dtypes ('torch_dtype' key parity)."""
    import jax.numpy as jnp

    table = {
        None: jnp.float32,
        "float32": jnp.float32,
        "fp32": jnp.float32,
        "bfloat16": jnp.bfloat16,
        "bf16": jnp.bfloat16,
        "float16": jnp.float16,
        "fp16": jnp.float16,
    }
    if name not in table:
        raise ValueError(f"Unknown dtype '{name}'.")
    return table[name]

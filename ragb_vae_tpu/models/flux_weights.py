"""Weight interop for FluxTransformer2D: diffusers torch <-> flax pytree.

Covers the three formats the reference touches:
- FluxTransformer2DModel checkpoints (`transformer/` subfolder,
  optionally sharded safetensors) — flux_kontext_textalpha.py:22-37;
- peft LoRA state dicts saved via FluxPipeline.save_lora_weights
  (`transformer.<module>.lora_A.weight` keys) —
  flux_kontext_textalpha_lora.py:315-323, flux_kontext_textalpha.py:183-197.

Our flax module names mirror the torch paths with dots flattened
(`transformer_blocks.0.attn.to_out.0` -> `transformer_blocks_0/attn/
to_out_0`), LoRA-capable Dense layers nest their frozen weight under
`base`, so conversion is a mechanical rename + 2D transpose.
"""
from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import numpy as np

from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig
from ragb_vae_tpu.models.weights import load_torch_state, save_torch_state

PyTree = Any

# Module leaf-names implemented as LoraDense (frozen kernel under "base").
LORA_TARGET_LEAVES = {
    "to_q", "to_k", "to_v", "to_out_0",
    "add_q_proj", "add_k_proj", "add_v_proj", "to_add_out",
    "net_0_proj", "net_2",
}

_BLOCK_RE = re.compile(r"^(transformer_blocks|single_transformer_blocks)\.(\d+)\.")


def _normalize_torch_key(key: str) -> str:
    """Torch dotted path -> our flattened module path (still dotted)."""
    if key.startswith("transformer."):
        key = key[len("transformer."):]
    key = _BLOCK_RE.sub(lambda m: f"{m.group(1)}_{m.group(2)}.", key)
    key = key.replace(".to_out.0.", ".to_out_0.")
    key = key.replace(".net.0.proj.", ".net_0_proj.")
    key = key.replace(".net.2.", ".net_2.")
    if key.startswith("norm_out.linear."):
        key = key.replace("norm_out.linear.", "norm_out_linear.")
    return key


def torch_key_to_flux_path(key: str, ndim: int) -> Tuple[Tuple[str, ...], bool]:
    """-> (flax param path, needs_transpose). Returns ((), False) to skip."""
    key = _normalize_torch_key(key)
    parts = key.split(".")
    leaf = parts[-1]
    module = parts[:-1]
    if not module:
        return (), False
    if module[-1] in LORA_TARGET_LEAVES:
        module = module + ["base"]
    if leaf == "weight":
        if ndim == 2:
            return tuple(module + ["kernel"]), True
        # RMSNorm / LayerNorm-style 1-D weight
        return tuple(module + ["weight"]), False
    if leaf == "bias":
        return tuple(module + ["bias"]), False
    return (), False


def flux_path_to_torch_key(path: Tuple[str, ...]) -> Tuple[Optional[str], bool]:
    """Inverse mapping -> (torch key, needs_transpose)."""
    parts = list(path)
    leaf = parts[-1]
    module = parts[:-1]
    if module and module[-1] == "base":
        module = module[:-1]
    if leaf == "kernel":
        torch_leaf, transpose = "weight", True
    elif leaf in ("weight", "bias"):
        torch_leaf, transpose = leaf, False
    elif leaf in ("lora_a", "lora_b"):
        return None, False  # exported separately via lora_params_to_peft_state
    else:
        return None, False
    name = ".".join(module)
    name = re.sub(r"^(transformer_blocks|single_transformer_blocks)_(\d+)\.", r"\1.\2.", name)
    name = name.replace(".net_0_proj", ".net.0.proj").replace(".net_2", ".net.2")
    if name.endswith(".to_out_0"):
        name = name[: -len(".to_out_0")] + ".to_out.0"
    if name == "norm_out_linear":
        name = "norm_out.linear"
    return f"{name}.{torch_leaf}", transpose


def _set_path(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def _iter_leaves(tree: Dict, prefix: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _iter_leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def flux_state_to_params(state: Dict[str, np.ndarray]) -> PyTree:
    params: Dict[str, Any] = {}
    for key, value in state.items():
        path, transpose = torch_key_to_flux_path(key, np.ndim(value))
        if not path:
            continue
        arr = np.asarray(value, dtype=np.float32)
        if transpose:
            arr = arr.T
        _set_path(params, path, arr)
    return params


def params_to_flux_state(params: PyTree) -> Dict[str, np.ndarray]:
    state: Dict[str, np.ndarray] = {}
    for path, value in _iter_leaves(params):
        key, transpose = flux_path_to_torch_key(path)
        if key is None:
            continue
        arr = np.asarray(value, dtype=np.float32)
        state[key] = arr.T if transpose else arr
    return state


# ---------------------------------------------------------------------------
# Checkpoint loading (single-file or sharded safetensors)
# ---------------------------------------------------------------------------
_WEIGHT_CANDIDATES = (
    "diffusion_pytorch_model.safetensors",
    "diffusion_pytorch_model.bin",
    "pytorch_model.safetensors",
    "pytorch_model.bin",
)


def _load_state_maybe_sharded(directory: Path) -> Dict[str, np.ndarray]:
    index_files = list(directory.glob("*.safetensors.index.json")) + list(
        directory.glob("*.bin.index.json")
    )
    if index_files:
        index = json.loads(index_files[0].read_text())
        shards = sorted(set(index["weight_map"].values()))
        state: Dict[str, np.ndarray] = {}
        for shard in shards:
            state.update(load_torch_state(directory / shard))
        return state
    for name in _WEIGHT_CANDIDATES:
        if (directory / name).exists():
            return load_torch_state(directory / name)
    raise FileNotFoundError(f"No transformer weights found in {directory}.")


def load_flux_transformer_params(
    model_path: Union[str, Path],
    subfolder: Optional[str] = "transformer",
) -> Tuple[FluxTransformerConfig, PyTree]:
    """Parity with load_transformer (flux_kontext_textalpha.py:22-37),
    reading a local HF-format dir instead of the hub."""
    directory = Path(model_path)
    if subfolder:
        directory = directory / subfolder
    config = FluxTransformerConfig.from_json(directory / "config.json")
    state = _load_state_maybe_sharded(directory)
    return config, flux_state_to_params(state)


def save_flux_transformer_params(
    config: FluxTransformerConfig, params: PyTree, output_dir: Union[str, Path]
) -> None:
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    cfg = {
        "_class_name": "FluxTransformer2DModel",
        **{k: (list(v) if isinstance(v, tuple) else v) for k, v in config.__dict__.items()},
    }
    (out / "config.json").write_text(json.dumps(cfg, indent=2))
    save_torch_state(params_to_flux_state(params), out / _WEIGHT_CANDIDATES[0])


# ---------------------------------------------------------------------------
# LoRA split / peft interop
# ---------------------------------------------------------------------------
def is_lora_path(path: Tuple[str, ...]) -> bool:
    return path[-1] in ("lora_a", "lora_b")


def split_lora_params(params: PyTree) -> Tuple[PyTree, PyTree]:
    """(base_tree, lora_tree) — same nesting, disjoint leaves."""
    base: Dict[str, Any] = {}
    lora: Dict[str, Any] = {}
    for path, value in _iter_leaves(params):
        _set_path(lora if is_lora_path(path) else base, path, value)
    return base, lora


def merge_params(base: PyTree, lora: PyTree) -> PyTree:
    merged: Dict[str, Any] = {}
    for tree in (base, lora):
        for path, value in _iter_leaves(tree):
            _set_path(merged, path, value)
    return merged


def lora_params_to_peft_state(lora_tree: PyTree) -> Dict[str, np.ndarray]:
    """Our lora_a (in,r)/lora_b (r,out) -> peft `transformer.<mod>.lora_A.weight`
    (r,in) / `lora_B.weight` (out,r) — the exact key format
    FluxPipeline.save_lora_weights writes."""
    state: Dict[str, np.ndarray] = {}
    for path, value in _iter_leaves(lora_tree):
        module = list(path[:-1])
        name = ".".join(module)
        name = re.sub(r"^(transformer_blocks|single_transformer_blocks)_(\d+)\.", r"\1.\2.", name)
        if name.endswith(".to_out_0"):
            name = name[: -len(".to_out_0")] + ".to_out.0"
        name = name.replace(".net_0_proj", ".net.0.proj").replace(".net_2", ".net.2")
        suffix = "lora_A.weight" if path[-1] == "lora_a" else "lora_B.weight"
        state[f"transformer.{name}.{suffix}"] = np.asarray(value, dtype=np.float32).T
    return state


def peft_state_to_lora_params(state: Dict[str, np.ndarray]) -> PyTree:
    lora: Dict[str, Any] = {}
    for key, value in state.items():
        if ".lora_A." not in key and ".lora_B." not in key:
            continue
        is_a = ".lora_A." in key
        key = key.split(".lora_A.")[0] if is_a else key.split(".lora_B.")[0]
        # peft sometimes nests `.default` adapter names; strip them
        key = key.replace(".default", "")
        # normalize with a trailing dot so suffix patterns (.to_out.0 etc.) match
        key = _normalize_torch_key(key + ".").rstrip(".")
        path = tuple(key.split(".")) + ("lora_a" if is_a else "lora_b",)
        _set_path(lora, path, np.asarray(value, dtype=np.float32).T)
    return lora

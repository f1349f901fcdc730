"""Weight interop: diffusers torch checkpoints <-> flax parameter pytrees.

Replaces the reference's load path (`AutoencoderKL.from_pretrained(...,
ignore_mismatched_sizes=True)` + `adapt_vae_to_rgba` +
`_maybe_restore_rgba_convs`, rgba_vae.py:95-191,230-272) with a
deterministic shape-adapting loader: RGB checkpoints are widened to RGBA
with an explicit zero-init alpha path; checkpoints that already contain
RGBA convs load verbatim. No NaN-producing partial loads exist by
construction (the reference needed a NaN assert, rgba_vae.py:186-191 — we
keep an equivalent check as a guard on corrupt files).

Also exports back to HF format (config.json +
diffusion_pytorch_model.safetensors with diffusers key names) so torch
users can consume our checkpoints.
"""
from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Optional, Tuple, Union

import numpy as np

from ragb_vae_tpu.models.vae_config import AutoencoderConfig

PyTree = Dict


# ---------------------------------------------------------------------------
# torch-file IO (host-side; torch used only as a file codec)
# ---------------------------------------------------------------------------
WEIGHT_FILENAMES = ("diffusion_pytorch_model.safetensors", "pytorch_model.bin")


def load_torch_state(weight_file: Union[str, Path]) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into float32 numpy arrays."""
    import torch  # local import: torch is a host-side codec, never device code

    weight_file = Path(weight_file)
    if weight_file.suffix == ".safetensors":
        from safetensors.torch import load_file

        state = load_file(str(weight_file))
    else:
        state = torch.load(weight_file, map_location="cpu", weights_only=True)
    out = {}
    for k, v in state.items():
        if not hasattr(v, "numpy"):
            continue
        out[k] = v.to(torch.float32).numpy()
    return out


def save_torch_state(state: Dict[str, np.ndarray], weight_file: Union[str, Path]) -> None:
    import torch
    from safetensors.torch import save_file

    tensors = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}
    Path(weight_file).parent.mkdir(parents=True, exist_ok=True)
    save_file(tensors, str(weight_file))


# ---------------------------------------------------------------------------
# Key translation (diffusers torch names <-> our flax module names)
# ---------------------------------------------------------------------------
_TORCH_TO_FLAX_RULES = [
    (re.compile(r"down_blocks\.(\d+)\.resnets\.(\d+)"), r"down_blocks_\1_resnets_\2"),
    (re.compile(r"down_blocks\.(\d+)\.downsamplers\.0"), r"down_blocks_\1_downsample"),
    (re.compile(r"up_blocks\.(\d+)\.resnets\.(\d+)"), r"up_blocks_\1_resnets_\2"),
    (re.compile(r"up_blocks\.(\d+)\.upsamplers\.0"), r"up_blocks_\1_upsample"),
    (re.compile(r"mid_block\.resnets\.(\d+)"), r"mid_block.resnets_\1"),
    (re.compile(r"mid_block\.attentions\.0"), r"mid_block.attention"),
    (re.compile(r"to_out\.0"), r"to_out"),
]

_FLAX_TO_TORCH_RULES = [
    (re.compile(r"down_blocks_(\d+)_resnets_(\d+)"), r"down_blocks.\1.resnets.\2"),
    (re.compile(r"down_blocks_(\d+)_downsample"), r"down_blocks.\1.downsamplers.0"),
    (re.compile(r"up_blocks_(\d+)_resnets_(\d+)"), r"up_blocks.\1.resnets.\2"),
    (re.compile(r"up_blocks_(\d+)_upsample"), r"up_blocks.\1.upsamplers.0"),
    (re.compile(r"mid_block\.resnets_(\d+)"), r"mid_block.resnets.\1"),
    (re.compile(r"mid_block\.attention\b"), r"mid_block.attentions.0"),
    (re.compile(r"\bto_out\b"), r"to_out.0"),
]


def torch_key_to_flax_path(key: str, ndim: int) -> Tuple[Tuple[str, ...], Optional[Tuple[int, ...]]]:
    """Map a torch state-dict key to (flax tree path, transpose axes or None)."""
    name = key
    for pat, repl in _TORCH_TO_FLAX_RULES:
        name = pat.sub(repl, name)
    parts = name.split(".")
    leaf = parts[-1]
    transpose = None
    if leaf == "weight":
        if ndim == 4:  # conv OIHW -> HWIO
            leaf, transpose = "kernel", (2, 3, 1, 0)
        elif ndim == 2:  # linear (out,in) -> (in,out)
            leaf, transpose = "kernel", (1, 0)
        else:  # norm scale
            leaf = "scale"
    return tuple(parts[:-1] + [leaf]), transpose


def flax_path_to_torch_key(path: Tuple[str, ...], ndim: int) -> Tuple[str, Optional[Tuple[int, ...]]]:
    parts = list(path)
    leaf = parts[-1]
    transpose = None
    if leaf == "kernel":
        leaf = "weight"
        transpose = (3, 2, 0, 1) if ndim == 4 else (1, 0)
    elif leaf == "scale":
        leaf = "weight"
    name = ".".join(parts[:-1] + [leaf])
    for pat, repl in _FLAX_TO_TORCH_RULES:
        name = pat.sub(repl, name)
    return name, transpose


def _set_path(tree: PyTree, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _iter_leaves(tree: PyTree, prefix: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _iter_leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def torch_state_to_flax_params(state: Dict[str, np.ndarray], *, strip_prefix: str = "vae.") -> PyTree:
    """Convert a diffusers AutoencoderKL state dict into our flax params tree.

    Accepts both bare keys and the `vae.`-prefixed keys the reference writes
    into `rgba_vae.pt` (rgba_vae_stage.py:888-889).
    """
    params: PyTree = {}
    for key, value in state.items():
        if strip_prefix and key.startswith(strip_prefix):
            key = key[len(strip_prefix):]
        path, transpose = torch_key_to_flax_path(key, value.ndim)
        if transpose is not None:
            value = value.transpose(transpose)
        _set_path(params, path, value)
    return params


def flax_params_to_torch_state(params: PyTree) -> Dict[str, np.ndarray]:
    state: Dict[str, np.ndarray] = {}
    for path, value in _iter_leaves(params):
        value = np.asarray(value)
        key, transpose = flax_path_to_torch_key(path, value.ndim)
        if transpose is not None:
            value = value.transpose(transpose)
        state[key] = value
    return state


# ---------------------------------------------------------------------------
# RGB -> RGBA widening (parity with adapt_vae_to_rgba, rgba_vae.py:95-123)
# ---------------------------------------------------------------------------
def adapt_params_to_rgba(
    params: PyTree, config: AutoencoderConfig, *, alpha_bias_init: float = 0.0
) -> Tuple[PyTree, AutoencoderConfig]:
    """Widen conv_in (in 3->4) and conv_out (out 3->4) with a zero alpha path.

    flax conv kernels are HWIO: conv_in widens axis 2 (inputs), conv_out
    widens axis 3 (outputs) plus its bias. Returns updated (params, config);
    no-ops on channels that are already 4-wide.
    """
    import copy

    params = copy.deepcopy(params)
    cfg = AutoencoderConfig(**{**config.__dict__})

    conv_in = params["encoder"]["conv_in"]
    k = np.asarray(conv_in["kernel"])
    if k.shape[2] != 4:
        widened = np.zeros(k.shape[:2] + (4, k.shape[3]), dtype=k.dtype)
        widened[:, :, :3, :] = k
        conv_in["kernel"] = widened

    conv_out = params["decoder"]["conv_out"]
    k = np.asarray(conv_out["kernel"])
    if k.shape[3] != 4:
        widened = np.zeros(k.shape[:3] + (4,), dtype=k.dtype)
        widened[..., :3] = k
        conv_out["kernel"] = widened
        bias = np.asarray(conv_out.get("bias", np.zeros(3, dtype=k.dtype)))
        new_bias = np.zeros(4, dtype=bias.dtype)
        new_bias[:3] = bias
        new_bias[3] = alpha_bias_init
        conv_out["bias"] = new_bias

    cfg.in_channels = 4
    cfg.out_channels = 4
    return params, cfg


def assert_finite_convs(params: PyTree) -> None:
    """Guard equivalent of the reference's NaN assert (rgba_vae.py:186-191)."""
    for name, leaf in (
        ("encoder.conv_in.kernel", params["encoder"]["conv_in"]["kernel"]),
        ("decoder.conv_out.kernel", params["decoder"]["conv_out"]["kernel"]),
    ):
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            raise RuntimeError(f"{name} contains NaN/Inf after loading checkpoint.")


# ---------------------------------------------------------------------------
# High-level load / save
# ---------------------------------------------------------------------------
def _resolve_checkpoint_dir(model_path: Union[str, Path], subfolder: Optional[str]) -> Path:
    base = Path(model_path)
    if subfolder:
        base = base / subfolder
    if not base.exists():
        raise FileNotFoundError(f"Checkpoint directory not found: {base}")
    return base


def _locate_weight_file(directory: Path) -> Path:
    for filename in WEIGHT_FILENAMES:
        candidate = directory / filename
        if candidate.exists():
            return candidate
    raise FileNotFoundError(f"No weight file ({WEIGHT_FILENAMES}) in {directory}")


def load_autoencoder_params(
    model_path: Union[str, Path],
    subfolder: Optional[str] = None,
    *,
    adapt_to_rgba: bool = False,
    alpha_bias_init: float = 0.0,
) -> Tuple[AutoencoderConfig, PyTree]:
    """Load an HF-format AutoencoderKL dir into (config, flax params).

    With `adapt_to_rgba=True`, RGB checkpoints are widened; checkpoints whose
    convs are already 4-channel pass through untouched (the deterministic
    replacement for the reference's ignore_mismatched_sizes + restore dance).
    """
    ckpt_dir = _resolve_checkpoint_dir(model_path, subfolder)
    config = AutoencoderConfig.from_json(ckpt_dir / "config.json")
    state = load_torch_state(_locate_weight_file(ckpt_dir))
    params = torch_state_to_flax_params(state)
    already_rgba = np.asarray(params["encoder"]["conv_in"]["kernel"]).shape[2] == 4
    if already_rgba:
        config.in_channels = 4
        config.out_channels = 4
    elif adapt_to_rgba:
        params, config = adapt_params_to_rgba(params, config, alpha_bias_init=alpha_bias_init)
    assert_finite_convs(params)
    return config, params


def save_autoencoder_params(
    config: AutoencoderConfig, params: PyTree, output_dir: Union[str, Path]
) -> None:
    """Export to HF format: config.json + diffusion_pytorch_model.safetensors."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    config.to_json(out / "config.json")
    save_torch_state(flax_params_to_torch_state(params), out / WEIGHT_FILENAMES[0])

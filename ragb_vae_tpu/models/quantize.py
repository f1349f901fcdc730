"""Weight-only int8 quantization for the FLUX transformer param tree.

Serving-memory play (beyond parity — the reference has no quantized
deployment path): full-scale FLUX.1 is 11.9 B params, ~24 GB in bf16,
which exceeds a single 16 GB v5e. Storing every Dense kernel as int8 with
a per-output-channel f32 scale brings the resident weights to ~11.1 GiB,
so the full 19+38-block sampler executes on ONE chip; each layer
dequantizes its own kernel inside the layer (flux_transformer.QDense), so
at most one layer's bf16 weights are live at a time.

Distinct from the int8 MXU-throughput probe refuted in
benchmarks/results.md: there int8 fed the MXU; here int8 is the storage
format and the MXU still computes in bf16.

The transform is host-side numpy (no device memory spike) and purely
structural: any {kernel: (in, out), bias?} dict produced by a Dense is
rewritten to {kernel_q, kernel_scale, bias?}; everything else (LoRA A/B,
RMSNorm weights, conv kernels) passes through untouched.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

PyTree = Any


def _is_dense_params(node: Any) -> bool:
    if not isinstance(node, dict) or "kernel" not in node:
        return False
    kernel = node["kernel"]
    return getattr(kernel, "ndim", 0) == 2


def quantize_kernel(kernel: np.ndarray) -> Dict[str, np.ndarray]:
    """Per-output-channel symmetric int8: scale = max|w| / 127 per column."""
    w = np.asarray(kernel, dtype=np.float32)
    absmax = np.max(np.abs(w), axis=0)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return {"kernel_q": q, "kernel_scale": scale}


def dequantize_kernel(kernel_q: np.ndarray, kernel_scale: np.ndarray) -> np.ndarray:
    return kernel_q.astype(np.float32) * np.asarray(kernel_scale, np.float32)[None, :]


def quantize_transformer_params(params: PyTree) -> PyTree:
    """Rewrite every Dense {kernel, bias?} in a FLUX transformer tree to
    weight-only int8 {kernel_q, kernel_scale, bias?} (host-side numpy).

    The result is exactly the param tree `FluxTransformer2D(...,
    weight_quant="int8")` expects; biases and non-Dense leaves keep their
    dtypes.
    """

    def walk(node: Any) -> Any:
        if _is_dense_params(node):
            out = dict(node)
            kernel = np.asarray(out.pop("kernel"))
            out.update(quantize_kernel(kernel))
            return out
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


def random_quantized_params_like(shape_tree: PyTree, seed: int = 0) -> PyTree:
    """Random int8 params matching an UNQUANTIZED init's shape tree.

    For throughput benches at scales where the bf16 tree cannot even be
    materialized on device (full FLUX.1 on 16 GB): build the quantized
    tree host-side, leaf by leaf, directly from `jax.eval_shape` of the
    plain model's init — no 24 GB intermediate. Scales are sized like a
    lecun-normal layer's column maxima so activations stay O(1).
    """
    rng = np.random.default_rng(seed)

    def walk(node: Any) -> Any:
        if _is_dense_params(node):
            out = {}
            in_f, features = node["kernel"].shape
            out["kernel_q"] = rng.integers(
                -127, 128, size=(in_f, features), dtype=np.int8
            )
            # ~3 sigma of lecun normal / 127, the scale a real quantized
            # checkpoint of this width would carry
            out["kernel_scale"] = np.full(
                (features,), 3.0 / np.sqrt(in_f) / 127.0, np.float32
            )
            if "bias" in node:
                out["bias"] = np.zeros(node["bias"].shape, np.float32)
            return out
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return np.asarray(
            rng.standard_normal(node.shape) * 0.02, dtype=np.float32
        )

    return walk(shape_tree)


# ---------------------------------------------------------------------------
# On-disk quantized checkpoints (flat npz — safetensors' torch-key mapping
# cannot carry the {kernel_q, kernel_scale} split or int8 dtypes)
# ---------------------------------------------------------------------------
_QUANT_MARKER = "quantization.json"
_QUANT_WEIGHTS = "quantized_params.npz"
_PATH_SEP = "/"


def is_quantized_checkpoint(directory) -> bool:
    from pathlib import Path

    return (Path(directory) / _QUANT_MARKER).exists()


def save_quantized_transformer(config, qparams: PyTree, output_dir) -> None:
    """Persist a quantized tree: config.json (HF-compatible fields) +
    quantized_params.npz (flat `a/b/c` keys, dtypes preserved) + marker."""
    import json
    from pathlib import Path

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    flat: Dict[str, np.ndarray] = {}

    def walk(node: Any, prefix: str) -> None:
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}{_PATH_SEP}{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)

    walk(qparams, "")
    np.savez(out / _QUANT_WEIGHTS, **flat)
    cfg = {k: (list(v) if isinstance(v, tuple) else v) for k, v in config.__dict__.items()}
    (out / "config.json").write_text(json.dumps(cfg, indent=2))
    (out / _QUANT_MARKER).write_text(
        json.dumps({"format": "weight_only_int8", "scheme": "per_output_channel_symmetric"})
    )


def load_quantized_transformer(directory):
    """Inverse of save_quantized_transformer -> (FluxTransformerConfig, tree)."""
    from pathlib import Path

    from ragb_vae_tpu.models.flux_transformer import FluxTransformerConfig

    d = Path(directory)
    if not is_quantized_checkpoint(d):
        raise FileNotFoundError(f"{d} is not a quantized checkpoint (no {_QUANT_MARKER}).")
    config = FluxTransformerConfig.from_json(d / "config.json")
    data = np.load(d / _QUANT_WEIGHTS)
    params: Dict[str, Any] = {}
    for key in data.files:
        node = params
        parts = key.split(_PATH_SEP)
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = data[key]
    return config, params

"""Tensor-parallel serving for the FLUX transformer (GSPMD).

Beyond parity: the reference serves its transformer on one GPU
(inference_rgba_flux.py); full-scale FLUX.1 (11.9 B, 22.2 GiB bf16) does
not fit a single 16 GB v5e. This module shards the param tree over a
`Mesh` "model" axis in the Megatron pattern and lets GSPMD insert the
collectives:

- the residual stream stays REPLICATED (no LayerNorm cross-device
  reductions),
- attention q/k/v and MLP up-projections are COLUMN-parallel (kernel
  features axis sharded -> activations sharded over heads/features inside
  the block),
- attention out / MLP down-projections are ROW-parallel (kernel input
  axis sharded -> one all-reduce per parallel region, the classic
  Megatron dataflow),
- AdaLN modulation layers are column-parallel for memory (GSPMD reshards
  their chunked outputs),
- embedders / final head are replicated (tiny).

Works for both plain ({kernel, bias}) and weight-only-int8
({kernel_q, kernel_scale, bias}, models/quantize.py) trees: kernel_q
shards like kernel, and kernel_scale follows the bias rule (it is a
per-output-channel vector). On 2 chips bf16 full-scale is ~11.1 GiB of
weights per chip; on 8 it is ~2.8 GiB, leaving room for batching.

The Pallas flash-attention kernel cannot be auto-partitioned; on meshes
the attention wrapper shard_maps over whichever of the batch/model axes
divide the (B, H) dims (ops/pallas/flash_attention.py) — with batch 1
serving, heads carry the parallelism (24 heads / 8 = 3 per chip).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any

# Module names whose Dense kernel (in, out) shards on the OUTPUT axis.
_COLUMN = {
    "to_q", "to_k", "to_v",
    "add_q_proj", "add_k_proj", "add_v_proj",
    "proj_mlp", "net_0_proj",
    "linear",  # AdaLayerNormZero modulation
    "linear_1",  # MLPEmbedder up
    "norm_out_linear",
}
# Module names whose kernel shards on the INPUT axis (their input is the
# column-parallel region's sharded activation; GSPMD closes the region
# with one all-reduce).
_ROW = {"to_out_0", "to_add_out", "net_2", "linear_2"}


def _dense_module_name(path: Tuple[str, ...]) -> str:
    """Name of the module owning a Dense param dict (LoraDense nests the
    QDense under 'base')."""
    return path[-2] if path[-1] == "base" else path[-1]


def _dense_kind(path: Tuple[str, ...]) -> str:
    name = _dense_module_name(path)
    if name == "proj_out":
        # single_transformer_blocks_*/proj_out is the block's row-parallel
        # down-projection; the top-level proj_out head is tiny -> replicate
        if any(p.startswith("single_transformer_blocks_") for p in path):
            return "row"
        return "replicated"
    if name in _COLUMN:
        return "column"
    if name in _ROW:
        return "row"
    return "replicated"


def _is_dense_dict(node: Any) -> bool:
    return isinstance(node, dict) and ("kernel" in node or "kernel_q" in node)


def transformer_param_specs(params: PyTree, *, axis: str = "model") -> PyTree:
    """PartitionSpec tree (same structure as `params`) for Megatron-style
    tensor parallelism over mesh axis `axis`.

    `params` may be a real tree, a jax.eval_shape result, or the
    weight-only-int8 tree — only dict structure and leaf names are used.
    """

    def dense_specs(node: dict, kind: str) -> dict:
        kernel_spec = {
            "column": P(None, axis),
            "row": P(axis, None),
            "replicated": P(),
        }[kind]
        out_vec_spec = P(axis) if kind == "column" else P()
        specs = {}
        for name in node:
            if name in ("kernel", "kernel_q"):
                specs[name] = kernel_spec
            elif name in ("bias", "kernel_scale"):
                specs[name] = out_vec_spec
            else:  # lora_a / lora_b etc: tiny, replicate
                specs[name] = P()
        return specs

    def walk(node: Any, path: Tuple[str, ...]) -> Any:
        if _is_dense_dict(node):
            return dense_specs(node, _dense_kind(path))
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return P()

    return walk(params, ())


def shard_transformer_params(
    params: PyTree, mesh: Mesh, *, axis: str = "model"
) -> Tuple[PyTree, PyTree]:
    """device_put `params` onto `mesh` with Megatron TP shardings.

    Returns (sharded_params, shardings) — pass `shardings` as the jit
    in_shardings for the param argument so GSPMD keeps the layout.
    """
    specs = transformer_param_specs(params, axis=axis)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(params, shardings), shardings


def sharded_sample_fn(
    model: Any,
    mesh: Mesh,
    *,
    axis: str = "model",
    num_inference_steps: int = 20,
    shardings: Optional[PyTree] = None,
    donate_gt: bool = False,
):
    """jit of `model.sample` with TP param shardings pinned.

    Everything except the transformer params (VAE params, the input image,
    the PRNG key) is replicated — the VAE is ~100x smaller than the
    transformer and its fused kernels are single-chip.
    """

    def sample(t_params, vae_params, gt, key):
        return model.sample(
            t_params, vae_params, gt, num_inference_steps=num_inference_steps, key=key
        )

    replicated = NamedSharding(mesh, P())
    in_shardings = (
        shardings if shardings is not None else None,
        replicated,
        replicated,
        replicated,
    )
    return jax.jit(
        sample,
        in_shardings=in_shardings,
        out_shardings=replicated,
        donate_argnums=(2,) if donate_gt else (),
    )

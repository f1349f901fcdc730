"""Shared CLI bootstrap for the --tp / --pp serving and inference paths.

`inference.run` and `serving_daemon.build_server` both turn the user's
`--tp N | --pp N` flags into a Mesh or a PipelinedFluxTransformer; keeping
two hand-synced copies of the device checks and constructor plumbing let
them drift once already, so the logic lives here exactly once.
"""
from __future__ import annotations

from typing import Any, Optional


def validate_tp_pp(tp: int, pp: int) -> None:
    """--tp and --pp are mutually exclusive (one transformer layout each)."""
    if tp > 1 and pp > 1:
        raise SystemExit("--tp and --pp are mutually exclusive.")


def build_tp_mesh(tp: int) -> Optional[Any]:
    """Mesh(("model",)) over the first `tp` devices; None when tp <= 1.

    The mesh is built before the model so `attention_mesh=mesh` can route
    the Pallas flash kernel through its head-sharded shard_map
    (parallel/tensor_parallel.py).
    """
    if tp <= 1:
        return None
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devices = jax.devices()
    if len(devices) < tp:
        raise SystemExit(f"--tp {tp} needs {tp} devices, found {len(devices)}.")
    return Mesh(np.array(devices[:tp]), ("model",))


def build_pipelined_transformer(
    model: Any,
    pp: int,
    *,
    dtype: Any,
    weight_quant: str = "none",
    lora_rank: int = 0,
    lora_alpha: float = 0.0,
) -> Optional[Any]:
    """PipelinedFluxTransformer over the first `pp` devices; None when pp <= 1.

    The pipeline stages must be constructed with the SAME quant/LoRA layout
    as the loaded params or `place_params` key-mismatches at serve time.
    """
    if pp <= 1:
        return None
    import jax

    from ragb_vae_tpu.parallel.pipeline import PipelinedFluxTransformer

    devices = jax.devices()
    if len(devices) < pp:
        raise SystemExit(f"--pp {pp} needs {pp} devices, found {len(devices)}.")
    return PipelinedFluxTransformer(
        model.transformer_config,
        devices=devices[:pp],
        dtype=dtype,
        weight_quant=weight_quant,
        lora_rank=lora_rank,
        lora_alpha=lora_alpha,
    )

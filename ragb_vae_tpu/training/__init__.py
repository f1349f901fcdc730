"""Training stages + dispatcher.

Stage registry parity with the reference (`scripts/train.py:31-41`,
`src/training/__init__.py:26-35`): `rgba_vae` and
`kontext_textalpha_lora` are real; `decompose` (VLD-MMDiT) and `refine`
are placeholders exactly like the reference.
"""
from __future__ import annotations

from typing import Any, Dict

from ragb_vae_tpu.training.rgba_vae_stage import (
    build_dataloader,
    build_training_batch,
    evaluate_rgba_vae,
    save_checkpoints,
    train_rgba_vae,
)

__all__ = [
    "build_dataloader",
    "build_training_batch",
    "evaluate_rgba_vae",
    "run_stage",
    "save_checkpoints",
    "train_decomposition",
    "train_refine",
    "train_rgba_vae",
]


def train_decomposition(cfg: Dict[str, Any]) -> None:
    raise NotImplementedError(
        "Decomposition training stage (VLD-MMDiT) is not implemented yet."
    )


def train_refine(cfg: Dict[str, Any]) -> None:
    raise NotImplementedError("Refinement training stage is not implemented yet.")


def run_stage(cfg: Dict[str, Any]):
    """Dispatch on `training.stage` (scripts/train.py:31-41)."""
    stage = cfg.get("training", {}).get("stage")
    if stage == "rgba_vae":
        return train_rgba_vae(cfg)
    if stage == "decompose":
        return train_decomposition(cfg)
    if stage == "refine":
        return train_refine(cfg)
    if stage == "kontext_textalpha_lora":
        from ragb_vae_tpu.training.flux_kontext_textalpha_lora import train_from_config

        return train_from_config(cfg)
    raise ValueError(f"Unknown training stage '{stage}'.")

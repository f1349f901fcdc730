"""Bucketed RGBA component/composite pair dataset.

Public-API parity with `RgbaComponentDataset` / `create_component_dataloader`
(rgba_component_dataset.py:46-143) — the names BASELINE.json requires — with
numpy HWC samples and our threaded DataLoader instead of torch's.

Directory layout (written by prepare_rgba_buckets):
  data_root/{train,val}/w{W}-h{H}/*.png + metadata/manifest.json
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Union

import numpy as np

from ragb_vae_tpu.data.image_io import load_rgba
from ragb_vae_tpu.data.loader import DataLoader, default_collate, pad_collate
from ragb_vae_tpu.ops.rgba import blend_to_white as _blend_to_white_jnp


def _blend_to_white(rgba: np.ndarray) -> np.ndarray:
    rgb, alpha = rgba[..., :3], rgba[..., 3:4]
    blended = rgb * alpha + (1.0 - alpha)
    return np.concatenate([blended, np.ones_like(alpha)], axis=-1)


class RgbaComponentDataset:
    """Yields {component, composite} RGBA pairs plus optional metadata."""

    def __init__(
        self,
        root_dir: Union[Path, str] = "data/rgba_layers",
        manifest_path: Optional[Union[Path, str]] = None,
        split: str = "train",
        limit: Optional[int] = None,
        transform: Optional[Callable[[Dict[str, Any]], Dict[str, Any]]] = None,
        include_metadata: bool = True,
        blend_component_to_white: bool = False,
    ) -> None:
        self.root_dir = Path(root_dir)
        manifest_path = Path(manifest_path or (self.root_dir / "metadata" / "manifest.json"))
        with manifest_path.open("r", encoding="utf-8") as f:
            entries: List[Dict[str, Any]] = json.load(f)
        self.entries = [entry for entry in entries if entry["split"] == split]
        if limit is not None:
            self.entries = self.entries[:limit]
        self.transform = transform
        self.include_metadata = include_metadata
        self.blend_component_to_white = blend_component_to_white

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        entry = self.entries[index]
        component = load_rgba(self.root_dir / entry["component_path"])
        composite = load_rgba(self.root_dir / entry["composite_path"])

        sample: Dict[str, Any] = {"component": component, "composite": composite}
        if self.blend_component_to_white:
            sample["component_white"] = _blend_to_white(component)
        if self.include_metadata:
            sample.update(
                {
                    "bucket": entry["bucket"],
                    "bucket_dims": tuple(entry["bucket_dims"]),
                    "source_sample": entry["source_sample"],
                    "component_index": entry["component_index"],
                    "original_size": tuple(entry["original_size"]),
                    "component_path": entry["component_path"],
                    "composite_path": entry["composite_path"],
                }
            )
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


def create_component_dataloader(
    root_dir: Union[Path, str] = "data/rgba_layers",
    manifest_path: Optional[Union[Path, str]] = None,
    split: str = "train",
    batch_size: int = 8,
    shuffle: bool = True,
    num_workers: int = 0,
    limit: Optional[int] = None,
    transform: Optional[Callable[[Dict[str, Any]], Dict[str, Any]]] = None,
    dataset_kwargs: Optional[Dict[str, Any]] = None,
    seed: Optional[int] = None,
    **loader_kwargs: Any,
) -> DataLoader:
    """Signature parity with rgba_component_dataset.py:112-143."""
    dataset_kwargs = dataset_kwargs or {}
    dataset = RgbaComponentDataset(
        root_dir=root_dir,
        manifest_path=manifest_path,
        split=split,
        limit=limit,
        transform=transform,
        **dataset_kwargs,
    )
    use_pad_collate = not dataset_kwargs.get("include_metadata", False)
    collate_fn = pad_collate if use_pad_collate else default_collate
    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle if split == "train" else False,
        num_workers=num_workers,
        collate_fn=collate_fn,
        seed=seed,
        **loader_kwargs,
    )

"""MixedBucketDataset: consume unified entries from mixed manifest schemas.

Parity with bucket_dataset.py:238-309. Single-image samples are keyed
"composite" (the training loop treats lone images as composites,
rgba_vae_stage.py:587-590).

Behavior-pinning note: the sample-dict keys ("composite"/variant names),
the bucket_to_indices grouping, and the per-entry image resolution are
data contracts consumed by the training stages and pinned by
BASELINE.json's API-compat requirement — the class is intentionally a
thin index over `build_bucket_entries` output and has little design
freedom; torch tensors are replaced by numpy HWC float arrays.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Union

from ragb_vae_tpu.data.image_io import load_rgba
from ragb_vae_tpu.data.manifest import build_bucket_entries  # re-export  # noqa: F401
from ragb_vae_tpu.data.sampler import BucketBatchSampler  # re-export  # noqa: F401


class MixedBucketDataset:
    """Entries must contain split, bucket, bucket_dims, image_path."""

    def __init__(
        self,
        root_dir: Union[Path, str],
        entries: Sequence[Dict[str, Any]],
        *,
        include_metadata: bool = False,
        include_background: bool = False,
        blend_component_to_white: bool = False,
        transform=None,
    ) -> None:
        self.root_dir = Path(root_dir)
        self.entries: List[Dict[str, Any]] = list(entries)
        self.include_metadata = include_metadata
        # kept for config compatibility; ignored exactly like the reference
        self.include_background = include_background
        self.blend_component_to_white = blend_component_to_white
        self.transform = transform

        self.bucket_to_indices: Dict[str, List[int]] = {}
        for idx, entry in enumerate(self.entries):
            self.bucket_to_indices.setdefault(entry["bucket"], []).append(idx)

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        entry = self.entries[index]
        image_path = entry.get("image_path")
        if image_path is None:
            raise ValueError("image_path is required for each entry.")
        root_dir = Path(entry.get("root_dir", self.root_dir))
        sample: Dict[str, Any] = {"composite": load_rgba(root_dir / image_path)}
        if self.include_metadata:
            sample.update(
                {
                    "bucket": entry.get("bucket"),
                    "bucket_dims": tuple(entry.get("bucket_dims") or ()),
                    "source_sample": entry.get("source_sample"),
                    "image_path": image_path,
                    "variant": entry.get("variant"),
                }
            )
        if self.transform is not None:
            sample = self.transform(sample)
        return sample

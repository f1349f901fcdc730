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

    def _resolve_path(self, entry: Dict[str, Any]) -> Path:
        image_path = entry.get("image_path")
        if image_path is None:
            raise ValueError("image_path is required for each entry.")
        return Path(entry.get("root_dir", self.root_dir)) / image_path

    def _make_sample(self, entry: Dict[str, Any], composite) -> Dict[str, Any]:
        sample: Dict[str, Any] = {"composite": composite}
        if self.include_metadata:
            sample.update(
                {
                    "bucket": entry.get("bucket"),
                    "bucket_dims": tuple(entry.get("bucket_dims") or ()),
                    "source_sample": entry.get("source_sample"),
                    "image_path": entry.get("image_path"),
                    "variant": entry.get("variant"),
                }
            )
        if self.transform is not None:
            sample = self.transform(sample)
        return sample

    def __getitem__(self, index: int) -> Dict[str, Any]:
        entry = self.entries[index]
        return self._make_sample(entry, load_rgba(self._resolve_path(entry)))

    def getitems(self, indices: Sequence[int], *, map_fn=None) -> List[Dict[str, Any]]:
        """Batch fetch used by the DataLoader: ONE native C++ batch decode
        (libpng + normalize across worker threads inside native/rgba_io.cpp,
        2.8x PIL per thread) when every image in the batch is a PNG of
        identical pixel dimensions — the common case for bucket-pure
        batches. Anything else falls back to per-item decode, routed through
        `map_fn` (the loader's thread pool) when provided so the fallback
        keeps its decode parallelism on non-fast-path environments."""
        entries = [self.entries[i] for i in indices]
        try:
            from ragb_vae_tpu.data import native_io

            paths = [self._resolve_path(e) for e in entries]
            if len(paths) > 1 and native_io.available() and all(
                p.suffix.lower() == ".png" for p in paths
            ):
                sizes = {native_io.png_size(p) for p in paths}
                if len(sizes) == 1:
                    (w, h) = next(iter(sizes))
                    batch = native_io.decode_batch(paths, h, w)
                    return [
                        self._make_sample(e, batch[j]) for j, e in enumerate(entries)
                    ]
        except Exception:
            pass  # odd PNGs / native failures -> per-item path below
        if map_fn is not None and len(indices) > 1:
            return list(map_fn(self.__getitem__, indices))
        return [self[i] for i in indices]

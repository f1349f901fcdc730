"""TextAlphaBucketDataset: (gt, text_alpha) RGBA pairs from a bucketed tree.

Parity with text_alpha_bucket_dataset.py:23-90. Layout:
  root/{split}/w{W}-h{H}/gt/*.png and .../text_alpha/{same name}.png
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Union

import numpy as np

from ragb_vae_tpu.data.image_io import load_rgba
from ragb_vae_tpu.data.sampler import BucketBatchSampler  # re-export  # noqa: F401
from ragb_vae_tpu.ops.buckets import BUCKET_RE


def _gather_pairs(split_root: Path) -> List[Dict]:
    entries: List[Dict] = []
    for bucket_dir in sorted(p for p in split_root.iterdir() if p.is_dir()):
        m = BUCKET_RE.match(bucket_dir.name)
        if not m:
            continue
        bucket_dims = (int(m.group("w")), int(m.group("h")))
        gt_dir = bucket_dir / "gt"
        text_alpha_dir = bucket_dir / "text_alpha"
        if not gt_dir.exists() or not text_alpha_dir.exists():
            continue
        for gt_path in sorted(gt_dir.glob("*.png")):
            ta_path = text_alpha_dir / f"{gt_path.stem}.png"
            if not ta_path.exists():
                continue
            entries.append(
                {
                    "bucket": bucket_dir.name,
                    "bucket_dims": bucket_dims,
                    "gt_path": gt_path,
                    "text_alpha_path": ta_path,
                    "sample_name": gt_path.stem,
                }
            )
    if not entries:
        raise ValueError(f"No gt/text_alpha pairs found under {split_root}")
    return entries


class TextAlphaBucketDataset:
    def __init__(self, root: Union[Path, str], split: str = "train") -> None:
        self.split_root = Path(root) / split
        if not self.split_root.exists():
            raise FileNotFoundError(f"Split root not found: {self.split_root}")
        self.entries = _gather_pairs(self.split_root)

        self.bucket_to_indices: Dict[str, List[int]] = {}
        for idx, entry in enumerate(self.entries):
            self.bucket_to_indices.setdefault(entry["bucket"], []).append(idx)

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int) -> Dict:
        entry = self.entries[idx]
        return {
            "gt": load_rgba(entry["gt_path"]),
            "text_alpha": load_rgba(entry["text_alpha_path"]),
            "bucket": entry["bucket"],
            "bucket_dims": np.asarray(entry["bucket_dims"], dtype=np.int64),
            "sample_name": entry["sample_name"],
        }

"""Synthetic on-disk dataset trees for data-pipeline tests."""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from PIL import Image


def _write_png(path: Path, w: int, h: int, seed: int = 0, mode: str = "RGBA") -> None:
    rng = np.random.default_rng(seed)
    channels = 4 if mode == "RGBA" else 3
    arr = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr, mode=mode).save(path)


def make_components_tree(root: Path, *, n_train: int = 6, n_val: int = 2) -> Path:
    """Bucketed component/composite tree + manifest (prepare_rgba_buckets layout)."""
    manifest = []
    buckets = [("w64-h64", (64, 64)), ("w128-h64", (128, 64))]
    idx = 0
    for split, count in (("train", n_train), ("val", n_val)):
        for i in range(count):
            bucket, dims = buckets[i % len(buckets)]
            name = f"sample{idx:03d}"
            comp_rel = f"{split}/{bucket}/{name}_fg000.png"
            composite_rel = f"{split}/{bucket}/{name}_composite.png"
            _write_png(root / comp_rel, *dims, seed=idx * 2)
            _write_png(root / composite_rel, *dims, seed=idx * 2 + 1)
            manifest.append(
                {
                    "split": split,
                    "bucket": bucket,
                    "bucket_dims": list(dims),
                    "component_path": comp_rel,
                    "composite_path": composite_rel,
                    "source_sample": name,
                    "component_index": 0,
                    "original_size": [dims[0] * 2, dims[1] * 2],
                }
            )
            idx += 1
    meta = root / "metadata"
    meta.mkdir(parents=True, exist_ok=True)
    (meta / "manifest.json").write_text(json.dumps(manifest))
    return root


def make_prism_real_tree(root: Path, *, n: int = 3) -> Path:
    manifest = []
    for i in range(n):
        bucket, dims = "w64-h64", (64, 64)
        base_rel = f"train/{bucket}/pr{i}_base.png"
        whole_rel = f"train/{bucket}/pr{i}_whole.png"
        layer_rel = f"train/{bucket}/pr{i}_layer0.png"
        for rel, s in ((base_rel, i * 3), (whole_rel, i * 3 + 1), (layer_rel, i * 3 + 2)):
            _write_png(root / rel, *dims, seed=100 + s)
        manifest.append(
            {
                "id": f"pr{i}",
                "split": "train",
                "bucket": bucket,
                "bucket_dims": list(dims),
                "base_path": base_rel,
                "whole_path": whole_rel,
                "layer_paths": [layer_rel],
            }
        )
    meta = root / "metadata"
    meta.mkdir(parents=True, exist_ok=True)
    (meta / "manifest.json").write_text(json.dumps(manifest))
    return root


def make_prism_pro_tree(root: Path, *, n: int = 2) -> Path:
    manifest = []
    for i in range(n):
        bucket, dims = "w64-h64", (64, 64)
        rels = {
            "base_path": f"train/{bucket}/pp{i}_base.png",
            "composite_path": f"train/{bucket}/pp{i}_composite.png",
            "fg_non_overlap_path": f"train/{bucket}/pp{i}_fg.png",
            "rep_path": f"train/{bucket}/pp{i}_rep.png",
        }
        for j, rel in enumerate(rels.values()):
            _write_png(root / rel, *dims, seed=200 + i * 4 + j)
        manifest.append(
            {"id": f"pp{i}", "split": "other", "bucket": bucket, "bucket_dims": list(dims), **rels}
        )
    meta = root / "metadata"
    meta.mkdir(parents=True, exist_ok=True)
    (meta / "manifest.json").write_text(json.dumps(manifest))
    return root


def make_laion_tree(root: Path, *, n: int = 4) -> Path:
    for i in range(n):
        _write_png(root / "train" / "w64-h64" / f"laion{i}.png", 64, 64, seed=300 + i, mode="RGB")
    return root


def make_text_alpha_tree(root: Path, *, n: int = 4) -> Path:
    for i in range(n):
        bucket = "w64-h64"
        _write_png(root / "train" / bucket / "gt" / f"s{i}.png", 64, 64, seed=400 + i)
        _write_png(root / "train" / bucket / "text_alpha" / f"s{i}.png", 64, 64, seed=450 + i)
    return root


def make_multilayer_tree(rendered: Path, json_root: Path, *, n: int = 2) -> None:
    for i in range(n):
        d = rendered / f"sample_{i}"
        _write_png(d / "background.png", 32, 32, seed=500 + i)
        for j in range(i + 1):  # variable layer counts
            _write_png(d / f"component_{j}.png", 32, 32, seed=510 + i * 4 + j)
        json_root.mkdir(parents=True, exist_ok=True)
        (json_root / f"sample_{i}.json").write_text(json.dumps({"layout_config": {"components": []}}))

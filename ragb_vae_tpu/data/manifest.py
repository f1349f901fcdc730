"""Manifest readers: unify the four bucket-dataset schemas into flat entries.

Behavioral parity with `build_bucket_entries` and the per-type standardizers
(bucket_dataset.py:46-235). Entries are plain dicts:
  {split, root_dir, bucket, bucket_dims, image_path, source_sample, variant}

Behavior-pinning note: the manifest JSON schemas (key names, nesting, the
four dataset-type layouts), the entry-dict fields, and the
per-variant path resolution are ALL external data contracts — they must
read the exact directory trees and manifest files produced by the
reference's offline prep tools, and BASELINE.json requires API-compatible
entry semantics. Each standardizer below is therefore necessarily a
near-mechanical restatement of the corresponding schema walk; there is no
independent design freedom beyond the shared `_make_entry` factoring.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

from ragb_vae_tpu.ops.buckets import parse_bucket_dims


def _load_json(path: Path) -> Any:
    with path.open("r", encoding="utf-8") as f:
        return json.load(f)


def _normalize_entry_bucket(entry: Dict[str, Any]) -> Tuple[str, Tuple[int, int]]:
    bucket = entry.get("bucket")
    bucket_dims = entry.get("bucket_dims")
    if bucket_dims is not None:
        return bucket, tuple(bucket_dims)
    if bucket is None:
        raise ValueError("Entry must contain either bucket or bucket_dims")
    return bucket, parse_bucket_dims(bucket)


def _make_entry(split, root, bucket, bucket_dims, image_path, source_sample, variant):
    return {
        "split": split,
        "root_dir": str(root),
        "bucket": bucket,
        "bucket_dims": bucket_dims,
        "image_path": image_path,
        "source_sample": source_sample,
        "variant": variant,
    }


def standardize_components_manifest(
    data: List[Dict[str, Any]], *, split: str, root: Path, respect_split: bool = True
) -> List[Dict[str, Any]]:
    """Schema written by prepare_rgba_buckets: component/composite/background
    paths plus selected_component_paths (bucket_dataset.py:46-79)."""
    entries: List[Dict[str, Any]] = []
    for item in data:
        if respect_split and item.get("split") != split:
            continue
        bucket, bucket_dims = _normalize_entry_bucket(item)
        paths: List[Tuple[str, str]] = []
        if item.get("component_path"):
            paths.append(("component", item["component_path"]))
        if item.get("composite_path"):
            paths.append(("composite", item["composite_path"]))
        if item.get("background_path"):
            paths.append(("background", item["background_path"]))
        for sel_path in item.get("selected_component_paths", []):
            paths.append(("selected_component", sel_path))
        for variant, path in paths:
            entries.append(
                _make_entry(split, root, bucket, bucket_dims, path, item.get("source_sample"), variant)
            )
    return entries


def standardize_prism_real(
    data: List[Dict[str, Any]], *, split: str, root: Path, respect_split: bool = True
) -> List[Dict[str, Any]]:
    """PrismLayersReal schema: base/whole/layer paths (bucket_dataset.py:82-114)."""
    entries: List[Dict[str, Any]] = []
    for item in data:
        if respect_split and item.get("split") != split:
            continue
        bucket, bucket_dims = _normalize_entry_bucket(item)
        candidates: List[Tuple[str, str]] = []
        if item.get("base_path"):
            candidates.append(("base", item["base_path"]))
        if item.get("whole_path"):
            candidates.append(("whole", item["whole_path"]))
        for layer_path in item.get("layer_paths") or []:
            candidates.append(("layer", layer_path))
        for variant, path in candidates:
            entries.append(_make_entry(split, root, bucket, bucket_dims, path, item.get("id"), variant))
    return entries


def standardize_prism_pro(
    data: List[Dict[str, Any]],
    *,
    split: str,
    use_fg: bool,
    use_rep: bool,
    root: Path,
    respect_split: bool = True,
) -> List[Dict[str, Any]]:
    """PrismLayersPro schema: base/composite/fg_non_overlap/rep
    (bucket_dataset.py:117-152)."""
    entries: List[Dict[str, Any]] = []
    for item in data:
        if respect_split and item.get("split") != split:
            continue
        bucket, bucket_dims = _normalize_entry_bucket(item)
        candidates: List[Tuple[str, str]] = []
        if item.get("base_path"):
            candidates.append(("base", item["base_path"]))
        if item.get("composite_path"):
            candidates.append(("composite", item["composite_path"]))
        if use_fg and item.get("fg_non_overlap_path"):
            candidates.append(("fg_non_overlap", item["fg_non_overlap_path"]))
        if use_rep and item.get("rep_path"):
            candidates.append(("rep", item["rep_path"]))
        for variant, path in candidates:
            entries.append(_make_entry(split, root, bucket, bucket_dims, path, item.get("id"), variant))
    return entries


def collect_laion_rgb(
    root: Path, *, split: str, max_count: Optional[int] = None
) -> List[Dict[str, Any]]:
    """Manifest-less RGB tree: {split}/wX-hY/*.png (bucket_dataset.py:155-180)."""
    split_root = root / split
    if not split_root.exists():
        return []
    entries: List[Dict[str, Any]] = []
    for bucket_dir in sorted(p for p in split_root.iterdir() if p.is_dir()):
        bucket = bucket_dir.name
        bucket_dims = parse_bucket_dims(bucket)
        for path in sorted(bucket_dir.glob("*.png")):
            entries.append(
                _make_entry(
                    split,
                    root,
                    bucket,
                    bucket_dims,
                    str(Path(split) / bucket / path.name),
                    path.stem,
                    "rgb_only",
                )
            )
            if max_count is not None and len(entries) >= max_count:
                return entries
    return entries


def build_bucket_entries(
    dataset_cfgs: Sequence[Dict[str, Any]], *, split: str
) -> List[Dict[str, Any]]:
    """Combine entries across dataset configs (bucket_dataset.py:183-235)."""
    combined: List[Dict[str, Any]] = []
    for cfg in dataset_cfgs:
        allowed_splits = cfg.get("splits")
        if allowed_splits is not None and split not in allowed_splits:
            continue
        dtype = cfg.get("type", "components")
        root = Path(cfg["root"])
        manifest_path = cfg.get("manifest")
        target_split = cfg.get("split", split)
        respect_split = bool(cfg.get("respect_manifest_split", True))

        if dtype == "laion_rgb":
            combined.extend(collect_laion_rgb(root, split=target_split, max_count=cfg.get("max_count")))
            continue

        manifest = Path(manifest_path or (root / "metadata" / "manifest.json"))
        data = _load_json(manifest)
        if dtype == "components":
            combined.extend(
                standardize_components_manifest(
                    data, split=target_split, root=root, respect_split=respect_split
                )
            )
        elif dtype == "prism_real":
            combined.extend(
                standardize_prism_real(data, split=target_split, root=root, respect_split=respect_split)
            )
        elif dtype == "prism_pro":
            combined.extend(
                standardize_prism_pro(
                    data,
                    split=target_split,
                    use_fg=bool(cfg.get("use_fg_non_overlap", True)),
                    use_rep=bool(cfg.get("use_rep", True)),
                    root=root,
                    respect_split=respect_split,
                )
            )
        else:
            raise ValueError(f"Unknown dataset type: {dtype}")
    return combined

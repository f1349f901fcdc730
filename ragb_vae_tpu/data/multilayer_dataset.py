"""Multilayer RGBA sample dataset (background + ordered component layers).

Parity with multilayer_dataset.py:26-221 and paths.py:12-29: per-sample dirs
holding background.png + component_*.png, composite computed by sequential
alpha compositing, variable-layer collate with component/visibility masks.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ragb_vae_tpu.data.image_io import pil_to_array

# Dataset path defaults, overridable via env (paths.py:12-29).
RENDERED_ROOT = Path(os.getenv("QIL_RENDERED_ROOT", "data/multilayer_rendered"))
JSON_ROOT = Path(os.getenv("QIL_JSON_ROOT", "data/multilayer_json"))
COMPOSITE_ROOT = Path(os.getenv("QIL_COMPOSITE_ROOT", ""))


def _component_index_key(path: Path) -> int:
    for part in reversed(path.stem.split("_")):
        if part.isdigit():
            return int(part)
    raise ValueError(f"Component filename lacks numeric suffix: {path.name}")


def resolve_background_path(sample_dir: Path) -> Path:
    direct = sample_dir / "background.png"
    if direct.exists():
        return direct
    prefixed = sample_dir / f"{sample_dir.name}_background.png"
    if prefixed.exists():
        return prefixed
    for candidate in sorted(sample_dir.glob("*_background.png")):
        if "thumbnail" in candidate.name.lower():
            continue
        return candidate
    raise FileNotFoundError(f"Background image not found in {sample_dir}")


def _layer_order(path: Path) -> Optional[int]:
    """Numeric layer index of a component file, or None if it isn't one
    (thumbnails, unparseable names)."""
    if "thumbnail" in path.name.lower():
        return None
    try:
        return _component_index_key(path)
    except ValueError:
        return None


def find_component_paths(sample_dir: Path) -> List[Path]:
    """Ordered component layers for one sample directory.

    The three glob patterns (bare, sample-prefixed, any-prefixed) are the
    on-disk naming contract shared with the reference datasets — the first
    pattern with any valid match wins, sorted by numeric layer index.
    """
    for pattern in (
        "component_*.png",
        f"{sample_dir.name}_component_*.png",
        "*_component_*.png",
    ):
        order = {p: _layer_order(p) for p in sample_dir.glob(pattern)}
        layers = sorted((p for p, k in order.items() if k is not None), key=order.get)
        if layers:
            return layers
    return []


def composite_layers(background: Image.Image, components: Sequence[Image.Image]) -> Image.Image:
    composite = background.convert("RGBA") if background.mode != "RGBA" else background.copy()
    for component in components:
        overlay = component if component.mode == "RGBA" else component.convert("RGBA")
        if overlay.size != composite.size:
            raise ValueError(
                f"Component size {overlay.size} does not match background {composite.size}"
            )
        composite = Image.alpha_composite(composite, overlay)
    return composite


@dataclass
class MultiLayerSample:
    sample_dir: Path
    background: np.ndarray  # (H, W, 4)
    components: List[np.ndarray]  # list of (H, W, 4)
    composite: np.ndarray  # (H, W, 4)
    layout: Dict[str, Any]
    visible_masks: List[np.ndarray]  # list of (H, W) bool


class MultiLayerDataset:
    def __init__(
        self,
        rendered_root: Path = RENDERED_ROOT,
        json_root: Path = JSON_ROOT,
        alpha_threshold: int = 100,
        max_samples: Optional[int] = None,
    ) -> None:
        self.rendered_root = Path(rendered_root)
        self.json_root = Path(json_root)
        self.alpha_threshold = alpha_threshold

        if not self.rendered_root.exists():
            raise FileNotFoundError(f"Rendered root not found: {self.rendered_root}")
        self.sample_dirs = sorted(p for p in self.rendered_root.iterdir() if p.is_dir())
        if max_samples is not None:
            self.sample_dirs = self.sample_dirs[:max_samples]
        if not self.sample_dirs:
            raise FileNotFoundError(f"No sample directories under {self.rendered_root}")

    def __len__(self) -> int:
        return len(self.sample_dirs)

    def __getitem__(self, index: int) -> MultiLayerSample:
        sample_dir = self.sample_dirs[index]
        with Image.open(resolve_background_path(sample_dir)) as img:
            background = img.convert("RGBA")
        components = []
        for p in find_component_paths(sample_dir):
            with Image.open(p) as img:
                components.append(img.convert("RGBA"))
        composite = composite_layers(background, components)

        visible_masks = [
            np.asarray(comp, dtype=np.uint8)[..., 3] >= self.alpha_threshold for comp in components
        ]

        json_path = self.json_root / f"{sample_dir.name}.json"
        layout: Dict[str, Any] = {"layout_config": {"components": []}}
        if json_path.exists():
            with open(json_path, "r", encoding="utf-8") as f:
                layout = json.load(f)

        return MultiLayerSample(
            sample_dir=sample_dir,
            background=pil_to_array(background),
            components=[pil_to_array(c) for c in components],
            composite=pil_to_array(composite),
            layout=layout,
            visible_masks=visible_masks,
        )


def multilayer_collate(batch: List[MultiLayerSample]) -> Dict[str, Any]:
    """Pad variable-length component stacks; emit masks. NHWC layout:
    components (B, L, H, W, 4), component_mask (B, L), visible_masks (B, L, H, W)."""
    if not batch:
        return {}
    max_components = max(len(item.components) for item in batch)

    backgrounds, composites, components_padded = [], [], []
    component_mask, visible_masks, sample_dirs, layouts = [], [], [], []

    for item in batch:
        backgrounds.append(item.background)
        composites.append(item.composite)
        layouts.append(item.layout)
        sample_dirs.append(str(item.sample_dir))

        comps = item.components
        vis = item.visible_masks
        if not comps:
            comps = [np.zeros_like(item.background)]
            vis = [np.zeros(item.background.shape[:2], dtype=bool)]

        pad_count = max_components - len(comps)
        if pad_count > 0:
            comps = comps + [np.zeros_like(comps[0])] * pad_count
            vis = vis + [np.zeros_like(vis[0])] * pad_count

        components_padded.append(np.stack(comps, axis=0))
        visible_masks.append(np.stack(vis, axis=0))
        mask = np.zeros(max_components, dtype=bool)
        mask[: len(item.components)] = True
        component_mask.append(mask)

    return {
        "background": np.stack(backgrounds, axis=0),
        "composite": np.stack(composites, axis=0),
        "components": np.stack(components_padded, axis=0),
        "component_mask": np.stack(component_mask, axis=0),
        "visible_masks": np.stack(visible_masks, axis=0),
        "layout": layouts,
        "sample_dirs": sample_dirs,
    }

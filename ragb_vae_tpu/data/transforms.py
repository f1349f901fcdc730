"""Sample transforms (host-side numpy, explicit RNG).

RandomBackgroundBlend parity with the reference (rgba_vae_stage.py:85-130):
with probability `prob`, blend selected RGBA tensors onto a random opaque
background color and set alpha to 1.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


class RandomBackgroundBlend:
    def __init__(
        self,
        prob: float = 0.1,
        keys: Sequence[str] = ("component",),
        color_range: Tuple[float, float] = (0.2, 0.9),
        seed: Optional[int] = None,
    ) -> None:
        self.prob = prob
        self.keys = tuple(keys)
        if color_range[0] >= color_range[1]:
            raise ValueError("color_range lower bound must be < upper bound.")
        self.color_range = color_range
        self.rng = np.random.default_rng(seed)

    def __call__(self, sample: Dict) -> Dict:
        if self.rng.random() >= self.prob:
            if "background_augmented" not in sample:
                sample = dict(sample)
                sample["background_augmented"] = False
            return sample
        augmented = dict(sample)
        for key in self.keys:
            tensor = augmented.get(key)
            if tensor is None:
                continue
            augmented[key] = self._blend(tensor)
        augmented["background_augmented"] = True
        return augmented

    def _blend(self, rgba: np.ndarray) -> np.ndarray:
        """(H, W, 4) -> blended onto a uniform random color, alpha := 1."""
        rgb = rgba[..., :3]
        alpha = rgba[..., 3:4]
        color = self.rng.uniform(*self.color_range, size=(1, 1, 3)).astype(rgba.dtype)
        blended = rgb * alpha + color * (1.0 - alpha)
        return np.concatenate([blended, np.ones_like(alpha)], axis=-1)

"""Independent torch restatement of lpips.LPIPS(net="vgg").

Used as the golden source for LPIPS parity tests (the `lpips` package and
torchvision weights are not installed in this image; reference
src/models/losses.py:50-57 builds lpips_lib.LPIPS(net="vgg")).

This restates, directly from the lpips/torchvision sources:
- torchvision vgg16 `features` layout (cfg "D": conv/ReLU stacks with
  MaxPool2d at indices 4, 9, 16, 23, 30);
- the lpips vgg16 wrapper's five slices ending at relu1_2, relu2_2,
  relu3_3, relu4_3, relu5_3 (features[0:4], [4:9], [9:16], [16:23],
  [23:30]);
- ScalingLayer (shift/scale constants), unit channel normalization
  (eps 1e-10), 1x1 lin heads, spatial mean, layer sum.

The module names inside each slice keep the original Sequential indices
(lpips vgg16 wrapper: `self.sliceN.add_module(str(x), features[x])`), so
`state_dict()` keys match the real `lpips.LPIPS(net='vgg').state_dict()`.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import torch
import torch.nn.functional as F

# (index -> out_channels) of every conv in torchvision vgg16.features
VGG16_CONVS = {
    0: (3, 64), 2: (64, 64),
    5: (64, 128), 7: (128, 128),
    10: (128, 256), 12: (256, 256), 14: (256, 256),
    17: (256, 512), 19: (512, 512), 21: (512, 512),
    24: (512, 512), 26: (512, 512), 28: (512, 512),
}
POOL_INDICES = (4, 9, 16, 23, 30)
SLICE_ENDS = (4, 9, 16, 23, 30)  # exclusive ends of lpips slices 1..5
SLICE_CHANNELS = (64, 128, 256, 512, 512)

SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def make_lpips_state(seed: int = 0, scale: float = 0.05) -> Dict[str, np.ndarray]:
    """Random state dict with the REAL lpips.LPIPS(net='vgg') key names."""
    rng = np.random.default_rng(seed)
    state: Dict[str, np.ndarray] = {}
    start = 0
    for slice_idx, end in enumerate(SLICE_ENDS, start=1):
        for conv_idx in range(start, end):
            if conv_idx not in VGG16_CONVS:
                continue
            cin, cout = VGG16_CONVS[conv_idx]
            state[f"net.slice{slice_idx}.{conv_idx}.weight"] = rng.normal(
                0, scale, size=(cout, cin, 3, 3)
            ).astype(np.float32)
            state[f"net.slice{slice_idx}.{conv_idx}.bias"] = rng.normal(
                0, scale, size=(cout,)
            ).astype(np.float32)
        start = end
    for k, c in enumerate(SLICE_CHANNELS):
        # official lpips lin weights are non-negative
        state[f"lin{k}.model.1.weight"] = np.abs(
            rng.normal(0, scale, size=(1, c, 1, 1))
        ).astype(np.float32)
    return state


def _normalize(feat: torch.Tensor, eps: float = 1e-10) -> torch.Tensor:
    norm = torch.sqrt(torch.sum(feat**2, dim=1, keepdim=True))
    return feat / (norm + eps)


def _vgg_slices(x: torch.Tensor, state: Dict[str, np.ndarray]) -> List[torch.Tensor]:
    h = x
    outs: List[torch.Tensor] = []
    start = 0
    for slice_idx, end in enumerate(SLICE_ENDS, start=1):
        for i in range(start, end):
            if i in POOL_INDICES:
                h = F.max_pool2d(h, 2, 2)
            elif i in VGG16_CONVS:
                w = torch.from_numpy(state[f"net.slice{slice_idx}.{i}.weight"])
                b = torch.from_numpy(state[f"net.slice{slice_idx}.{i}.bias"])
                h = F.conv2d(h, w, b, padding=1)
            else:  # ReLU index
                h = F.relu(h)
        outs.append(h)
        start = end
    return outs


@torch.no_grad()
def lpips_distance_torch(
    x: np.ndarray, y: np.ndarray, state: Dict[str, np.ndarray]
) -> np.ndarray:
    """Per-sample LPIPS distance; x/y NCHW float32 RGB in [-1, 1] -> (B,)."""
    xt = (torch.from_numpy(x) - SHIFT) / SCALE
    yt = (torch.from_numpy(y) - SHIFT) / SCALE
    feats_x = _vgg_slices(xt, state)
    feats_y = _vgg_slices(yt, state)
    total = torch.zeros(x.shape[0])
    for k, (fx, fy) in enumerate(zip(feats_x, feats_y)):
        diff = (_normalize(fx) - _normalize(fy)) ** 2
        lin = torch.from_numpy(state[f"lin{k}.model.1.weight"])
        total = total + F.conv2d(diff, lin).mean(dim=(1, 2, 3))
    return total.numpy()

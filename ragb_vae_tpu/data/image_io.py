"""Host-side image IO: PIL decode -> numpy HWC float32 in [0, 1].

PIL stays on the host (SURVEY.md §2.4); the device only ever sees numpy
arrays. Channels-last means a PIL decode is already in the right layout —
zero transposes on the hot path (the reference pays a CHW permute per
sample, rgba_component_dataset.py:35).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Union

import numpy as np
from PIL import Image, PngImagePlugin, UnidentifiedImageError

# Allow PNG text/iCCP chunks up to this size (default 64MB) — parity with
# bucket_dataset.py:17-19; avoids Pillow safety-guard failures on large
# embedded profiles.
PNG_TEXT_CHUNK_LIMIT = int(os.environ.get("PNG_MAX_TEXT_CHUNK", 64 * 1024 * 1024))
if hasattr(PngImagePlugin, "MAX_TEXT_CHUNK"):
    PngImagePlugin.MAX_TEXT_CHUNK = max(PngImagePlugin.MAX_TEXT_CHUNK, PNG_TEXT_CHUNK_LIMIT)


def pil_to_array(img: Image.Image) -> np.ndarray:
    """PIL image -> (H, W, 4) float32 in [0,1].

    Grayscale is tripled to RGB; RGB gets alpha=1 — parity with
    `_pil_to_tensor` (rgba_component_dataset.py:28-36).
    """
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[2] == 3:
        alpha = np.ones_like(arr[..., :1], dtype=arr.dtype)
        arr = np.concatenate([arr, alpha], axis=-1)
    return arr


def load_rgba(path: Union[str, Path]) -> np.ndarray:
    """Decode an image file as RGBA -> (H, W, 4) float32 in [0,1].

    PNGs take the native C++ path (libpng decode + normalize in one pass,
    native/rgba_io.cpp) when the library is built; everything else — and
    any native failure — goes through PIL. Error surfaces carry the
    offending path (bucket_dataset.py:271-282).
    """
    path = Path(path)
    if path.suffix.lower() == ".png":
        from ragb_vae_tpu.data import native_io

        if native_io.available():
            try:
                return native_io.decode_png(path)
            except Exception:
                pass  # fall through to PIL (interlaced/odd PNGs, races)
    try:
        with Image.open(path) as img:
            rgba = img.convert("RGBA")
    except (UnidentifiedImageError, OSError, ValueError) as exc:
        if isinstance(exc, ValueError) and "MAX_TEXT_CHUNK" in str(exc):
            raise RuntimeError(
                f"PNG text chunk too large (iCCP) in file: {path}. "
                f"Consider sanitizing the image or increasing PNG_MAX_TEXT_CHUNK."
            ) from exc
        raise RuntimeError(f"Failed to load image at {path}: {exc}") from exc
    return pil_to_array(rgba)


def save_rgba(array: np.ndarray, path: Union[str, Path]) -> None:
    """(H, W, 4) float in [0,1] -> PNG file.

    PNG outputs take the native C++ encode (clip + quantize + libpng in
    one pass, native/rgba_io.cpp) when the library is built; other
    suffixes — and any native failure — go through PIL."""
    arr = np.clip(np.asarray(array, dtype=np.float32), 0.0, 1.0)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.suffix.lower() == ".png":
        from ragb_vae_tpu.data import native_io

        if native_io.available():
            try:
                return native_io.encode_png(path, arr)
            except Exception:
                pass  # PIL fallback below
    img = Image.fromarray((arr * 255).astype(np.uint8), mode="RGBA")
    img.save(path)

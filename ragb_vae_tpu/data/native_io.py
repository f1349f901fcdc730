"""ctypes bindings for the native C++ IO core (native/rgba_io.cpp).

The hot decode->normalize->pad->stack chain of the input pipeline runs in
C++ worker threads (libpng), producing one ready (B, H, W, 4) float32
batch without per-image Python-object churn. Gracefully degrades to the
PIL path when the shared library isn't built — `available()` gates every
call site. Build with `make -C native` (auto-attempted once on import).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = Path(__file__).with_name("_libragb_io.so")
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_build(force: bool = False) -> None:
    native_dir = Path(__file__).resolve().parent.parent.parent / "native"
    if not (native_dir / "Makefile").exists():
        return
    try:
        cmd = ["make", "-C", str(native_dir)]
        if force:
            subprocess.run(cmd + ["clean"], capture_output=True, timeout=60,
                           check=False)
        subprocess.run(cmd, capture_output=True, timeout=120, check=False)
    except Exception:
        pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("RAGB_NO_NATIVE_IO"):
        return None
    if not _LIB_PATH.exists():
        _try_build()
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    if not hasattr(lib, "ragb_encode_batch_f32"):
        # stale prebuilt library from before the encode symbols existed:
        # rebuild once and reload; degrade to PIL if still missing
        del lib
        _try_build(force=True)
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        if not hasattr(lib, "ragb_encode_batch_f32"):
            return None
    lib.ragb_decode_png_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ragb_decode_png_f32.restype = ctypes.c_int
    lib.ragb_png_size.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ragb_png_size.restype = ctypes.c_int
    lib.ragb_decode_batch_f32.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ragb_decode_batch_f32.restype = ctypes.c_int
    lib.ragb_encode_png_f32.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.ragb_encode_png_f32.restype = ctypes.c_int
    lib.ragb_encode_batch_f32.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.ragb_encode_batch_f32.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def png_size(path) -> Tuple[int, int]:
    """(width, height) without decoding pixels."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not available")
    w, h = ctypes.c_int(), ctypes.c_int()
    rc = lib.ragb_png_size(str(path).encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"ragb_png_size failed ({rc}) for {path}")
    return w.value, h.value


def decode_png(path, *, max_h: Optional[int] = None, max_w: Optional[int] = None) -> np.ndarray:
    """Decode one PNG -> (H, W, 4) float32 in [0,1] (or zero-padded to
    (max_h, max_w, 4) when given)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not available")
    if max_h is None or max_w is None:
        max_w, max_h = png_size(path)
    buf = np.empty((max_h, max_w, 4), dtype=np.float32)
    w, h = ctypes.c_int(), ctypes.c_int()
    rc = lib.ragb_decode_png_f32(
        str(path).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_h,
        max_w,
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        raise IOError(f"ragb_decode_png_f32 failed ({rc}) for {path}")
    return buf


def decode_batch(
    paths: Sequence, max_h: int, max_w: int, *, num_threads: int = 8
) -> np.ndarray:
    """Decode PNGs into one (B, max_h, max_w, 4) float32 batch with C++
    worker threads. Raises on any per-image failure (path named)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not available")
    count = len(paths)
    out = np.empty((count, max_h, max_w, 4), dtype=np.float32)
    c_paths = (ctypes.c_char_p * count)(*[str(p).encode() for p in paths])
    status = (ctypes.c_int * count)()
    failures = lib.ragb_decode_batch_f32(
        c_paths,
        count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_h,
        max_w,
        num_threads,
        status,
    )
    if failures:
        bad: List[str] = [str(paths[i]) for i in range(count) if status[i] != 0]
        raise IOError(f"native decode failed for {len(bad)} images, first: {bad[0]}")
    return out


def encode_png(path, image: np.ndarray, *, compression: int = 6) -> None:
    """Encode one (H, W, 4) float32 [0,1] image to an 8-bit RGBA PNG."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not available")
    arr = np.ascontiguousarray(image, dtype=np.float32)
    if arr.ndim != 3 or arr.shape[-1] != 4:
        raise ValueError(f"encode_png expects (H, W, 4), got {arr.shape}")
    rc = lib.ragb_encode_png_f32(
        str(path).encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        arr.shape[0],
        arr.shape[1],
        compression,
    )
    if rc != 0:
        raise IOError(f"ragb_encode_png_f32 failed ({rc}) for {path}")


def encode_batch(
    paths: Sequence,
    batch: np.ndarray,
    *,
    compression: int = 6,
    num_threads: int = 8,
) -> None:
    """Encode a (B, H, W, 4) float32 [0,1] batch to PNGs with C++ worker
    threads (the serving daemon / batch-inference response path)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library not available")
    arr = np.ascontiguousarray(batch, dtype=np.float32)
    if arr.ndim != 4 or arr.shape[-1] != 4:
        raise ValueError(f"encode_batch expects (B, H, W, 4), got {arr.shape}")
    if len(paths) != arr.shape[0]:
        raise ValueError(f"{len(paths)} paths for batch of {arr.shape[0]}")
    count = len(paths)
    c_paths = (ctypes.c_char_p * count)(*[str(p).encode() for p in paths])
    status = (ctypes.c_int * count)()
    failures = lib.ragb_encode_batch_f32(
        c_paths,
        count,
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        arr.shape[1],
        arr.shape[2],
        compression,
        num_threads,
        status,
    )
    if failures:
        bad = [str(paths[i]) for i in range(count) if status[i] != 0]
        raise IOError(f"native encode failed for {len(bad)} images, first: {bad[0]}")

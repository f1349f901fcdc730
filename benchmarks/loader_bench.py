"""Host-side input-pipeline throughput: native C++ batch decode vs PIL.

Round-2 priority #4 wired the native libpng batch decode into
`MixedBucketDataset.getitems` -> loader; this measures what that wiring
buys in images/s on this host, and checks the pipeline can feed the
measured train step (4.572 img/s at 512^2 — benchmarks/results.md).

Measures, on a synthetic RGBA PNG corpus:
  1. native decode_batch (C++ libpng worker threads, one (B,H,W,4) f32 out)
  2. PIL per-image fallback (load_rgba with RAGB_NO_NATIVE_IO=1 semantics:
     PIL open + RGBA convert + f32 normalize + stack)
  3. native encode_batch (the serving-daemon response path) vs PIL save

Pure-host benchmark: no jax import (safe while the TPU tunnel is down).
Reference counterpart: torch DataLoader workers + PIL decode in
/root/reference/src/data/bucket_dataset.py (per-image Image.open in
__getitem__); the reference has no native decode path at all.
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from PIL import Image

from ragb_vae_tpu.data import native_io


def make_corpus(root: Path, n: int, size: int, seed: int = 0) -> list:
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        # photographic-ish content: smooth gradients + noise compresses
        # like real layers (pure noise would overweight zlib time)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        base = np.stack(
            [yy, xx, 0.5 * (yy + xx), np.clip(yy * 1.2, 0, 1)], axis=-1
        )
        img = np.clip(base + rng.normal(0, 0.03, base.shape), 0, 1)
        arr = (img * 255).astype(np.uint8)
        p = root / f"img_{size}_{i:03d}.png"
        Image.fromarray(arr, "RGBA").save(p)
        paths.append(p)
    return paths


def pil_decode_batch(paths, size: int) -> np.ndarray:
    out = np.empty((len(paths), size, size, 4), dtype=np.float32)
    for i, p in enumerate(paths):
        with Image.open(p) as im:
            out[i] = np.asarray(im.convert("RGBA"), dtype=np.float32) / 255.0
    return out


def bench(fn, *, warmup: int = 1, iters: int = 3) -> float:
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--count", type=int, default=32)
    ap.add_argument("--sizes", type=int, nargs="+", default=[512, 1024])
    ap.add_argument("--threads", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    if not native_io.available():
        print("native IO library unavailable — building or PIL-only box")

    ncpu = os.cpu_count()
    print(f"host: {ncpu} cpu core(s); corpus {args.count} images/size")

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        for size in args.sizes:
            paths = make_corpus(root, args.count, size)
            n = len(paths)
            rows = []

            t = bench(lambda: pil_decode_batch(paths, size), iters=args.iters)
            rows.append(("decode PIL per-image", t, n / t))

            if native_io.available():
                for nt in args.threads:
                    t = bench(
                        lambda nt=nt: native_io.decode_batch(
                            paths, size, size, num_threads=nt
                        ),
                        iters=args.iters,
                    )
                    rows.append((f"decode native t={nt}", t, n / t))
                ref = pil_decode_batch(paths, size)
                nat = native_io.decode_batch(paths, size, size)
                # C++ multiplies by (1/255.f); PIL path divides — 1 ulp apart
                assert np.allclose(ref, nat, atol=1e-7), "native decode != PIL"

            batch = pil_decode_batch(paths, size)
            outs = [root / f"out_{size}_{i:03d}.png" for i in range(n)]

            def pil_encode():
                for p, img in zip(outs, batch):
                    Image.fromarray(
                        (np.clip(img, 0, 1) * 255).round().astype(np.uint8), "RGBA"
                    ).save(p)

            t = bench(pil_encode, iters=args.iters)
            rows.append(("encode PIL per-image", t, n / t))
            if native_io.available():
                for nt in args.threads:
                    t = bench(
                        lambda nt=nt: native_io.encode_batch(
                            outs, batch, num_threads=nt
                        ),
                        iters=args.iters,
                    )
                    rows.append((f"encode native t={nt}", t, n / t))

            print(f"\n== {size}x{size} RGBA, batch {n} ==")
            for name, t, ips in rows:
                print(f"  {name:24s} {t*1e3:9.1f} ms  {ips:8.1f} img/s")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Multilayer dataset + dataloader sanity check (shape dump + optional
RGBA-VAE reconstruction grid over a checkerboard).

Parity with reference scripts/dataset_sanity_check.py:20-108.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ragb_vae_tpu.data.loader import DataLoader  # noqa: E402
from ragb_vae_tpu.data.multilayer_dataset import (  # noqa: E402
    MultiLayerDataset,
    multilayer_collate,
)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rendered-root", type=str, default=None)
    parser.add_argument("--json-root", type=str, default=None)
    parser.add_argument("--max-samples", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--alpha-threshold", type=int, default=100)
    parser.add_argument("--vae-checkpoint", type=str, default="checkpoints/rgba_vae_init")
    parser.add_argument("--output", type=str, default="outputs/dataset_sanity.png")
    args = parser.parse_args()

    kwargs = {}
    if args.rendered_root:
        kwargs["rendered_root"] = Path(args.rendered_root)
    if args.json_root:
        kwargs["json_root"] = Path(args.json_root)
    ds = MultiLayerDataset(
        alpha_threshold=args.alpha_threshold, max_samples=args.max_samples, **kwargs
    )
    dl = DataLoader(
        ds, batch_size=args.batch_size, shuffle=False, num_workers=0,
        collate_fn=multilayer_collate,
    )
    batch = next(iter(dl))
    print("Batch keys:", list(batch.keys()))
    for key in ("background", "composite", "components", "component_mask", "visible_masks"):
        value = batch[key]
        print(f"{key}:", getattr(value, "shape", value))
    print("sample_dirs:", batch["sample_dirs"])

    ckpt_dir = Path(args.vae_checkpoint)
    if not ckpt_dir.exists():
        print(f"No VAE checkpoint at {ckpt_dir}; skipping reconstruction test.")
        return

    import jax
    import jax.numpy as jnp

    from ragb_vae_tpu.models.rgba_vae import RgbaVAE
    from ragb_vae_tpu.ops.rgba import composite_over_checkerboard
    from ragb_vae_tpu.training.rgba_vae_stage import _to_uint8

    model, params = RgbaVAE.from_pretrained_rgb(str(ckpt_dir), subfolder=None)
    mask = np.asarray(batch["component_mask"][0]).astype(bool)
    components = np.asarray(batch["components"][0])[mask]
    if components.size == 0:
        print("No valid components in batch; skipping reconstruction test.")
        return
    recon, _ = model.forward(params, jnp.asarray(components), jax.random.PRNGKey(0))
    rows = []
    for gt, rc in zip(components, np.asarray(recon)):
        gt_c = np.asarray(composite_over_checkerboard(jnp.asarray(gt[None])))[0]
        rc_c = np.asarray(composite_over_checkerboard(jnp.asarray(rc[None])))[0]
        rows.append(np.concatenate([gt_c, rc_c], axis=1))
    grid = np.concatenate(rows, axis=0)
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    from PIL import Image

    Image.fromarray(_to_uint8(grid)).save(out)
    print(f"Saved reconstruction grid to {out}")


if __name__ == "__main__":
    main()

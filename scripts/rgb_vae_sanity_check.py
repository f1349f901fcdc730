#!/usr/bin/env python3
"""Reconstruct components through the STOCK RGB VAE (alpha dropped) to
establish a visual baseline grid.

Parity with reference scripts/rgb_vae_sanity_check.py:56-134; this is
the `rgb_vae_sanity_check` path named in BASELINE.json config 1. Accepts
either a multilayer sample (--rendered-root/--json-root) or a single
--image PNG.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def reconstruct_rgb(model, params, component, key):
    """component: (1, H, W, 3) in [0,1] -> reconstruction in [0,1]."""
    import jax.numpy as jnp

    vae_input = jnp.asarray(component) * 2.0 - 1.0
    posterior = model.encode(params, vae_input)
    latents = posterior.sample(key)
    recon = model.decode(params, latents)
    return jnp.clip((recon.astype(jnp.float32) + 1.0) * 0.5, 0.0, 1.0)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rendered-root", type=str, default=None)
    parser.add_argument("--json-root", type=str, default=None)
    parser.add_argument("--image", type=str, default=None, help="Single RGB(A) PNG to round-trip.")
    parser.add_argument("--sample-index", type=int, default=0)
    parser.add_argument("--max-components", type=int, default=12)
    parser.add_argument("--rgb-vae", type=str, required=True, help="Local dir of the RGB VAE.")
    parser.add_argument("--vae-subfolder", type=str, default="vae")
    parser.add_argument("--overlay-background", action="store_true")
    parser.add_argument("--output", type=str, default="outputs/rgb_vae_sanity.png")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ragb_vae_tpu.models.rgba_vae import RgbaVAE
    from ragb_vae_tpu.models.vae_config import AutoencoderConfig
    from ragb_vae_tpu.models.weights import load_autoencoder_params
    from ragb_vae_tpu.models.vae import AutoencoderKL
    from ragb_vae_tpu.training.rgba_vae_stage import _to_uint8

    subfolder = args.vae_subfolder if args.vae_subfolder != "" else None
    config, params = load_autoencoder_params(args.rgb_vae, subfolder)
    module = AutoencoderKL(config)

    class _Stock:
        def encode(self, params, x):
            return module.apply({"params": params}, x, method=lambda m, v: m.encode(v))

        def decode(self, params, z):
            return module.apply({"params": params}, z, method=lambda m, v: m.decode(v))

    model = _Stock()

    images = []
    if args.image:
        arr = np.asarray(Image.open(args.image).convert("RGB"), np.float32) / 255.0
        images.append(arr)
    else:
        from ragb_vae_tpu.data.multilayer_dataset import MultiLayerDataset

        kwargs = {}
        if args.rendered_root:
            kwargs["rendered_root"] = Path(args.rendered_root)
        if args.json_root:
            kwargs["json_root"] = Path(args.json_root)
        ds = MultiLayerDataset(alpha_threshold=0, **kwargs)
        sample = ds[args.sample_index]
        for comp in sample.components[: args.max_components]:
            comp = np.asarray(comp, np.float32)
            rgb, alpha = comp[..., :3], comp[..., 3:]
            if args.overlay_background:
                rgb = rgb * alpha + np.asarray(sample.background, np.float32)[..., :3] * (1 - alpha)
            images.append(rgb)

    if not images:
        print("No images to reconstruct.")
        return

    key = jax.random.PRNGKey(0)
    rows = []
    for idx, rgb in enumerate(images):
        if config.in_channels == 4:
            inp = np.concatenate([rgb, np.ones_like(rgb[..., :1])], axis=-1)
        else:
            inp = rgb
        recon = np.asarray(reconstruct_rgb(model, params, inp[None], jax.random.fold_in(key, idx)))[0]
        rows.append(np.concatenate([rgb, recon[..., :3]], axis=1))
    grid = np.concatenate(rows, axis=0)
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(_to_uint8(grid)).save(out)
    mse = float(np.mean((rows[0][:, : rows[0].shape[1] // 2] - rows[0][:, rows[0].shape[1] // 2 :]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-8))
    print(f"Saved RGB VAE sanity grid to {out} (first-image PSNR {psnr:.2f} dB)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Convert a Qwen/Flux VAE to RGBA and stash it under checkpoints/rgba_vae_init.

Parity with reference scripts/prepare_rgba_vae_init.py:24-71 (same flags;
wrapper over convert_qwen_vae_to_rgba with a default output dir).
"""
from __future__ import annotations

import sys
from pathlib import Path

SCRIPT_DIR = Path(__file__).resolve().parent
for path in (SCRIPT_DIR, SCRIPT_DIR.parent):
    if str(path) not in sys.path:
        sys.path.insert(0, str(path))

from convert_qwen_vae_to_rgba import build_parser, convert  # noqa: E402
from ragb_vae_tpu.models.weights import save_autoencoder_params  # noqa: E402


def main() -> None:
    parser = build_parser()
    # same flags, but output defaults to checkpoints/rgba_vae_init
    for action in parser._actions:
        if action.dest == "output_dir":
            action.required = False
            action.default = str(SCRIPT_DIR.parent / "checkpoints" / "rgba_vae_init")
    args = parser.parse_args()

    default_subfolder = "ae" if args.arch == "flux" else "vae"
    subfolder = args.subfolder if args.subfolder not in (None, "") else default_subfolder
    config, params = convert(args.source, subfolder, args.alpha_bias_init)
    output_dir = Path(args.output_dir).expanduser().resolve()
    save_autoencoder_params(config, params, output_dir)
    print(f"[prepare_rgba_vae_init] Saved {args.arch} RGBA VAE to {output_dir}")


if __name__ == "__main__":
    main()

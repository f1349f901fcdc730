#!/usr/bin/env python
"""Quantize a FLUX transformer checkpoint to weight-only int8 on disk.

Beyond-parity serving tool (the reference has no quantized deployment
path): full-scale FLUX.1 is ~24 GB in bf16 and does not fit one 16 GB
v5e; weight-only int8 (per-output-channel symmetric, models/quantize.py)
brings resident weights to ~11.1 GiB so the full sampler runs on a single
chip. The output dir is loaded transparently by
`FluxTextAlphaModel.from_pretrained(..., weight_quant="int8")` and
`ragb-infer --quant int8`.

Usage:
  python scripts/quantize_flux_checkpoint.py \
      --model_path /ckpts/flux-kontext --subfolder transformer \
      --output_dir /ckpts/flux-kontext-int8/transformer
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", required=True,
                   help="HF-format checkpoint root (dir containing the transformer subfolder).")
    p.add_argument("--subfolder", default="transformer")
    p.add_argument("--output_dir", required=True,
                   help="Destination for the quantized checkpoint (config.json + "
                        "quantized_params.npz + quantization.json).")
    args = p.parse_args(argv)

    import numpy as np

    from ragb_vae_tpu.models.flux_weights import load_flux_transformer_params
    from ragb_vae_tpu.models.quantize import (
        quantize_transformer_params,
        save_quantized_transformer,
    )

    config, params = load_flux_transformer_params(args.model_path, args.subfolder)
    import jax

    params = jax.tree_util.tree_map(np.asarray, params)
    n_params = sum(int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(params))
    qparams = quantize_transformer_params(params)
    q_bytes = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(qparams))
    save_quantized_transformer(config, qparams, args.output_dir)
    print(
        f"Quantized {n_params/1e9:.2f} B params -> {q_bytes/2**30:.2f} GiB resident "
        f"(bf16 would be {2*n_params/2**30:.2f} GiB); saved to {args.output_dir}"
    )


if __name__ == "__main__":
    main()

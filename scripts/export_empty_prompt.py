#!/usr/bin/env python3
"""Export the empty-prompt CLIP+T5 embeddings to empty_prompt_embeds.npz.

The reference recomputes these at every startup
(flux_kontext_textalpha.py:86-146, encoders then discarded); on a TPU pod
with no hub access we precompute once — run this script on any machine
where the FLUX checkpoint's text encoders are available locally, then ship
the npz beside the checkpoint. Training/inference pick it up automatically.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ragb_vae_tpu.models.flux_kontext_textalpha import encode_empty_prompt  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True,
                        help="Local HF-layout FLUX dir (tokenizer/, text_encoder/, tokenizer_2/, text_encoder_2/).")
    args = parser.parse_args()
    prompt, pooled, text_ids = encode_empty_prompt(args.model_path)
    print(
        f"Exported empty prompt embeds to {Path(args.model_path) / 'empty_prompt_embeds.npz'}: "
        f"prompt {prompt.shape}, pooled {pooled.shape}, text_ids {text_ids.shape}"
    )


if __name__ == "__main__":
    main()

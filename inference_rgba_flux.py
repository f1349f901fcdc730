#!/usr/bin/env python3
"""Inference CLI shim — logic lives in ragb_vae_tpu.inference (parity with
the reference inference_rgba_flux.py:46-116)."""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ragb_vae_tpu.inference import main  # noqa: E402

if __name__ == "__main__":
    main()

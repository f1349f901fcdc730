#!/usr/bin/env python
"""Thin shim over ragb_vae_tpu.serving_daemon (kept at scripts/serve.py so
the daemon sits next to train.py like the reference's script layout; the
installed `ragb-serve` entry point calls the module directly)."""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ragb_vae_tpu.serving_daemon import (  # noqa: E402,F401
    build_server,
    main,
    make_handler,
    parse_args,
)

if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Training entry point: `python scripts/train.py --config configs/flux_vae.yaml`.

Parity with reference scripts/train.py:23-41 — loads a `{data, training,
model}` YAML and dispatches on `training.stage`. No `accelerate launch`
wrapper: one process drives all local TPU chips via the device mesh; for
multi-host pods, run one process per host (jax.distributed initializes
from the TPU environment automatically).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ragb_vae_tpu.config import load_config  # noqa: E402
from ragb_vae_tpu.training import run_stage  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(description="Train ragb-vae-tpu stages.")
    parser.add_argument("--config", required=True, help="Path to the YAML config.")
    parser.add_argument(
        "--stage", default=None, help="Override training.stage from the config."
    )
    args = parser.parse_args()

    from ragb_vae_tpu.parallel.mesh import maybe_init_distributed
    from ragb_vae_tpu.utils.compilation_cache import enable_compilation_cache

    maybe_init_distributed()
    cfg = load_config(args.config)
    if args.stage:
        cfg.setdefault("training", {})["stage"] = args.stage
    # persistent XLA compile cache: restarted/preempted runs skip straight
    # past the minutes-long train-step compile (training.compilation_cache:
    # auto|off|<dir>, default auto)
    enable_compilation_cache(cfg.get("training", {}).get("compilation_cache", "auto"))
    run_stage(cfg)


if __name__ == "__main__":
    main()

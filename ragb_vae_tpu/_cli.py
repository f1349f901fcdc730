"""Console entry points (pyproject [project.scripts])."""
from __future__ import annotations

import argparse


def train_main() -> None:
    parser = argparse.ArgumentParser(description="Train ragb-vae-tpu stages.")
    parser.add_argument("--config", required=True)
    parser.add_argument("--stage", default=None)
    args = parser.parse_args()

    from ragb_vae_tpu.config import load_config
    from ragb_vae_tpu.parallel.mesh import maybe_init_distributed
    from ragb_vae_tpu.training import run_stage
    from ragb_vae_tpu.utils.compilation_cache import enable_compilation_cache

    maybe_init_distributed()
    cfg = load_config(args.config)
    if args.stage:
        cfg.setdefault("training", {})["stage"] = args.stage
    enable_compilation_cache(cfg.get("training", {}).get("compilation_cache", "auto"))
    run_stage(cfg)


def infer_main() -> None:
    from ragb_vae_tpu.inference import main

    main()


def serve_main() -> None:
    from ragb_vae_tpu.serving_daemon import main

    main()

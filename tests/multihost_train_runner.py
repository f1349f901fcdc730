"""Subprocess runner for the real multi-host training test.

Launched twice by tests/test_multihost.py (process 0 and 1), each with 4
virtual CPU devices: `jax.distributed.initialize` forms a 2-process,
8-device cluster and `train_rgba_vae` runs the SAME config in both —
sharded input pipeline, GSPMD step over the global mesh, gathered
checkpoint written by process 0 only. This is the execution proof for
the multi-host path that previously only existed as code review.

Usage: python tests/multihost_train_runner.py <pid> <nproc> <coordinator> <cfg.yaml>
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    pid, nproc, coordinator, cfg_path = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax

    jax.distributed.initialize(coordinator, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc and jax.local_device_count() == 4

    import yaml

    from ragb_vae_tpu.training import run_stage

    with open(cfg_path) as fh:
        cfg = yaml.safe_load(fh)
    metrics = run_stage(cfg)
    print(
        f"[mh p{pid}] done loss={metrics['train/loss']:.6f} "
        f"step={metrics['global_step']:.0f} "
        f"psnr_white={metrics.get('val/psnr_white', float('nan')):.4f}",
        flush=True,
    )
    assert metrics["global_step"] > 0


if __name__ == "__main__":
    main()

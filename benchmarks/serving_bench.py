#!/usr/bin/env python
"""Serving-daemon load benchmark: dynamic-batcher throughput + latency.

sample_bench.py measures the raw jitted sampler; THIS measures the serving
product (`ragb_vae_tpu/serving.py` — what `ragb-serve` runs): concurrent
clients submit through the dynamic batcher, so the number includes bucket
snapping, batch assembly/padding, queueing delay, and result resize —
plus the latency distribution a deployment actually cares about.

Closed-loop load: `--clients` threads each keep one request in flight for
`--requests` total. Reports throughput, p50/p90/p99 end-to-end latency,
and mean batch occupancy (served/batches — how well the batcher fills
`--max-batch` under this concurrency).

Real run (TPU, queued in tpu_pending.sh):
  python benchmarks/serving_bench.py --clients 8 --requests 32
CPU smoke:
  python benchmarks/serving_bench.py --tiny --clients 4 --requests 8 --steps 2
"""
from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_tiny():
    """Test-scale model: exercises the full batcher path on CPU."""
    import jax

    from tests.test_flux_kontext import _build_model

    model = _build_model()
    vae_params = model.vae.init_params(jax.random.PRNGKey(0), image_size=32)
    import jax.numpy as jnp

    dummy = dict(
        hidden_states=jnp.zeros((1, 8, model.transformer_config.in_channels)),
        encoder_hidden_states=model.prompt_embeds,
        pooled_projections=model.pooled_prompt_embeds,
        timestep=jnp.asarray([0.5]),
        img_ids=jnp.zeros((8, 3)),
        txt_ids=model.text_ids,
        guidance=jnp.asarray([3.5]),
    )
    t_params = model.transformer.init(jax.random.PRNGKey(1), **dummy)["params"]
    return model, t_params, vae_params, 64


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--no-auto-batch", action="store_true",
                   help="fixed max_batch (pre-round-5 behavior) instead of "
                   "the measured per-bucket warmup policy")
    p.add_argument("--max-delay-ms", type=float, default=30.0)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--blocks", choices=["mid", "full"], default="mid")
    p.add_argument("--quant", choices=["none", "int8"], default="none")
    p.add_argument("--tiny", action="store_true", help="test-scale model (CPU smoke)")
    args = p.parse_args()

    import jax

    try:  # full-scale compiles are ~10+ min through the tunnel; cache them
        from ragb_vae_tpu.utils.compilation_cache import enable_compilation_cache

        enable_compilation_cache(min_compile_time_secs=1.0)
    except Exception:
        pass

    from ragb_vae_tpu.serving import InferenceServer, ServeConfig

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    if args.tiny:
        model, t_params, vae_params, size = build_tiny()
    else:
        from sample_bench import FULL_BLOCKS, MID_BLOCKS, build

        blocks = FULL_BLOCKS if args.blocks == "full" else MID_BLOCKS
        model, t_params, vae_params, _ = build(1, blocks=blocks, quant=args.quant)
        size = 512

    cfg = ServeConfig(
        max_batch=args.max_batch,
        max_delay_ms=args.max_delay_ms,
        steps=args.steps,
        bucket_multiple=64,
        max_pixels=size * size,
        auto_batch=not args.no_auto_batch,
    )
    server = InferenceServer(model, t_params, vae_params, cfg)
    t0 = time.perf_counter()
    server.warmup([(size, size)])
    print(f"warmup compile: {time.perf_counter() - t0:.1f}s "
          f"(serving batches: {server._bucket_batch or {'*': args.max_batch}})",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    images = [
        rng.random((size, size, 4)).astype(np.float32) for _ in range(args.clients)
    ]
    latencies: list = []
    lat_lock = threading.Lock()
    remaining = [args.requests]

    def client(idx: int) -> None:
        while True:
            with lat_lock:
                if remaining[0] <= 0:
                    return
                remaining[0] -= 1
                seq = remaining[0]
            t_req = time.perf_counter()
            out = server.submit(images[idx], seed=seq).result(
                timeout=cfg.request_timeout_s
            )
            assert out.shape == (size, size, 4)
            with lat_lock:
                latencies.append(time.perf_counter() - t_req)

    with server:
        t0 = time.perf_counter()
        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(args.clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats = dict(server.stats)

    lat = np.sort(np.asarray(latencies))
    occupancy = stats["served"] / max(stats["batches"], 1)
    scale = "tiny" if args.tiny else (
        f"{args.blocks}{'_' + args.quant if args.quant != 'none' else ''}"
    )
    print(
        f"{len(lat)} requests, {args.clients} clients, wall {wall:.1f}s | "
        f"p50 {lat[len(lat) // 2]:.2f}s p90 {lat[int(len(lat) * 0.9)]:.2f}s "
        f"p99 {lat[min(int(len(lat) * 0.99), len(lat) - 1)]:.2f}s | "
        f"occupancy {occupancy:.2f}/{args.max_batch}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"serving_{size}px_{args.steps}step_{scale}_c{args.clients}",
                "value": round(len(lat) / wall, 3),
                "unit": "req/s/chip",
                "vs_baseline": 0.0,
                "p50_s": round(float(lat[len(lat) // 2]), 3),
                "p99_s": round(float(lat[min(int(len(lat) * 0.99), len(lat) - 1)]), 3),
                "batch_occupancy": round(occupancy, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

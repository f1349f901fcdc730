"""HTTP serving daemon for text-alpha inference (CLI core).

Beyond-parity: the reference ships only a one-shot CLI
(/root/reference/inference_rgba_flux.py:46-116); this keeps one resident
process with warm compiled programs and a dynamic batcher
(ragb_vae_tpu/serving.py) so TPU serving gets batched throughput at
bounded latency. `scripts/serve.py` is a thin shim over this module;
the installed `ragb-serve` entry point calls it directly.

    ragb-serve \
        --pretrained_model_name_or_path ... --rgba_vae_path ... \
        [--lora_path ...] [--port 8418] [--max-batch 4] [--steps 20] \
        [--tp N | --pp N] [--quant int8] [--warmup 512x512,1024x1024]

Endpoints:
    POST /predict[?seed=N]   body: RGBA PNG  ->  200, predicted RGBA PNG
    GET  /healthz            -> {"status": "ok", "served": N, "pending": N,
                                 "batches": N, "latency_avg_ms": x,
                                 "latency_max_ms": x}
"""
from __future__ import annotations

import argparse
import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Batched text-alpha inference daemon.")
    p.add_argument("--pretrained_model_name_or_path", type=str, required=True)
    p.add_argument("--rgba_vae_path", type=str, required=True)
    p.add_argument("--vae_subfolder", type=str, default="ae")
    p.add_argument("--lora_path", type=str, default=None)
    p.add_argument("--rank", type=int, default=96)
    p.add_argument("--lora_alpha", type=int, default=128)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8418)
    p.add_argument("--max-batch", type=int, default=4,
                   help="Upper bound on the serving batch. With auto-batch "
                   "(default) warmup measures b1 vs this bound per bucket and "
                   "serves at the smallest batch within 5%% of the best "
                   "throughput — full-scale int8 picks b1 (b4 is measured-"
                   "worse on BOTH axes there), mid-size keeps b4 "
                   "(benchmarks/results.md round-4 serving table).")
    p.add_argument("--no-auto-batch", action="store_true",
                   help="Always serve at --max-batch (skip the measured "
                   "per-bucket batch policy).")
    p.add_argument("--max-delay-ms", type=float, default=30.0)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--precision", type=str, default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel degree: shard the transformer over the "
                   "first N devices' 'model' mesh axis (Megatron pattern, "
                   "parallel/tensor_parallel.py). Full-scale FLUX.1 bf16 needs "
                   "tp>=2 on 16 GB chips (or --quant int8 on one).")
    p.add_argument("--pp", type=int, default=1,
                   help="Pipeline-parallel stages: the transformer's blocks split "
                   "over the first N devices (parallel/pipeline.py); no per-block "
                   "collectives — only the activation carrier crosses stage "
                   "boundaries. Mutually exclusive with --tp.")
    p.add_argument("--quant", type=str, default="none", choices=["none", "int8"],
                   help="Weight-only int8 transformer serving: full-scale FLUX.1 "
                   "fits one 16 GB chip (scripts/quantize_flux_checkpoint.py).")
    p.add_argument("--warmup", type=str, default="",
                   help="Comma-separated HxW sizes to pre-compile at startup "
                   "(e.g. '512x512,1024x1024'); cold compiles are minutes-long "
                   "on TPU and should not land on the first request.")
    p.add_argument("--compilation-cache", type=str, default="auto",
                   help="Persistent XLA compilation cache: 'auto' (default, "
                   "~/.cache/ragb_vae_tpu/xla_cache), 'off', or a directory. "
                   "Makes daemon restarts skip the minutes-long warmup "
                   "compiles (disk hits instead of recompiles).")
    return p.parse_args(argv)


def build_server(args) -> "InferenceServer":
    import jax
    import jax.numpy as jnp

    from ragb_vae_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache(getattr(args, "compilation_cache", "auto"))

    from ragb_vae_tpu.models.flux_kontext_textalpha import (
        FluxTextAlphaModel,
        read_lora_metadata,
    )
    from ragb_vae_tpu.serving import InferenceServer, ServeConfig

    from ragb_vae_tpu.parallel.bootstrap import (
        build_pipelined_transformer,
        build_tp_mesh,
        validate_tp_pp,
    )

    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    validate_tp_pp(args.tp, args.pp)
    mesh = build_tp_mesh(args.tp)
    if args.lora_path:
        meta = read_lora_metadata(args.lora_path)
        if meta:
            args.rank = int(meta.get("rank", args.rank))
            args.lora_alpha = int(meta.get("lora_alpha", meta.get("alpha", args.lora_alpha)))
    model, t_params, vae_params = FluxTextAlphaModel.from_pretrained(
        args.pretrained_model_name_or_path,
        vae_path=args.rgba_vae_path,
        vae_subfolder=args.vae_subfolder,
        dtype=dtype,
        lora_rank=args.rank if args.lora_path else 0,
        lora_alpha=float(args.lora_alpha),
        weight_quant=args.quant,
        attention_mesh=mesh,
    )
    if args.lora_path:
        t_params = model.load_lora(t_params, args.lora_path)
    if jax.default_backend() == "tpu":
        model.vae.enable_fused()
    else:
        model.vae.enable_slicing()
    cfg = ServeConfig(
        max_batch=args.max_batch, max_delay_ms=args.max_delay_ms, steps=args.steps,
        auto_batch=not getattr(args, "no_auto_batch", False),
    )
    pipeline = build_pipelined_transformer(
        model, args.pp, dtype=dtype, weight_quant=args.quant,
        lora_rank=args.rank if args.lora_path else 0,
        lora_alpha=float(args.lora_alpha),
    )
    return InferenceServer(model, t_params, vae_params, cfg, mesh=mesh, pipeline=pipeline)


def make_handler(server) -> type:
    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet by default
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._json(200, {"status": "ok", **server.stats})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/predict":
                self._json(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                img = Image.open(io.BytesIO(self.rfile.read(length))).convert("RGBA")
                arr = np.asarray(img, dtype=np.float32) / 255.0
                qs = parse_qs(url.query)
                seed = int(qs["seed"][0]) if "seed" in qs else None
                pred = server.submit(arr, seed=seed).result(
                    timeout=server.config.request_timeout_s
                )
                out = Image.fromarray(
                    (np.clip(pred, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8), "RGBA"
                )
                buf = io.BytesIO()
                out.save(buf, format="PNG")
                data = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            except Exception as exc:
                self._json(500, {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


def main(argv=None) -> None:
    args = parse_args(argv)
    server = build_server(args)
    if args.warmup:
        sizes = []
        for part in args.warmup.split(","):
            h, w = part.lower().split("x")
            sizes.append((int(h), int(w)))
        print(f"[serve] warming up {sizes} ...", flush=True)
        server.warmup(sizes)
        print("[serve] warmup done", flush=True)
    server.start()
    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server))
    print(f"[serve] listening on http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch}, steps={args.steps})", flush=True)

    # SIGTERM (preemption / orchestrator shutdown): stop accepting, answer
    # everything already queued, exit 0 — mirrors the training stages'
    # preemption handling (utils/preemption.py). httpd.shutdown() must run
    # off the serve_forever thread, and a signal handler must not block.
    import signal
    import threading

    def _on_sigterm(signum, frame):
        print("[serve] SIGTERM — draining and shutting down", flush=True)
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not the main thread (embedded use)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        clean = server.drain()
        print(f"[serve] drained {'cleanly' if clean else 'with queued work failed'}; "
              f"served {server.stats['served']}", flush=True)


if __name__ == "__main__":
    main()

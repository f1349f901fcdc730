"""Text-alpha inference (library + CLI core).

Parity with the reference inference_rgba_flux.py:46-116 — same flags,
LoRA rank/alpha auto-read from metadata.json, seeded sampling — driving
the jitted JAX sampling loop. `inference_rgba_flux.py` at the repo root
is a thin shim over this module; the installed `ragb-infer` entry point
calls it directly.
"""
from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Inference: predict text_alpha from RGBA input using FluxTextAlphaModel"
    )
    p.add_argument("--pretrained_model_name_or_path", type=str, required=True)
    p.add_argument("--rgba_vae_path", type=str, required=True)
    p.add_argument("--vae_subfolder", type=str, default="ae")
    p.add_argument("--lora_path", type=str, default=None,
                   help="Directory with saved LoRA weights (FluxPipeline.save_lora_weights format).")
    p.add_argument("--rank", type=int, default=96, help="LoRA rank (must match training).")
    p.add_argument("--lora_alpha", type=int, default=128, help="LoRA alpha (must match training).")
    p.add_argument("--input_image", type=str, required=True,
                   help="Path to RGBA input image (condition), or a directory / "
                   "glob of images for batch inference (beyond-parity: the "
                   "fused TPU path is fastest batched).")
    p.add_argument("--output_path", type=str, required=True,
                   help="Where to save predicted text_alpha RGBA (a directory "
                   "when --input_image matches multiple files).")
    p.add_argument("--batch_size", type=int, default=4,
                   help="Images per compiled sampling step in batch mode "
                   "(same-sized images are grouped; sizes compile separately).")
    p.add_argument("--steps", type=int, default=20, help="Number of flow steps during sampling.")
    p.add_argument("--seed", type=int, default=None, help="Optional seed for deterministic sampling.")
    p.add_argument("--precision", type=str, default="bf16", choices=["bf16", "fp16", "fp32"])
    p.add_argument("--quant", type=str, default="none", choices=["none", "int8"],
                   help="Weight-only int8 transformer serving (beyond parity): "
                   "full-scale FLUX.1 fits one 16 GB chip. Loads a pre-quantized "
                   "checkpoint (scripts/quantize_flux_checkpoint.py) directly, or "
                   "quantizes a plain checkpoint host-side at load.")
    p.add_argument("--pp", type=int, default=1,
                   help="Pipeline-parallel stages: split the transformer's blocks "
                   "over the first N devices (parallel/pipeline.py) — full-scale "
                   "FLUX.1 bf16 across small-HBM chips with no per-block "
                   "collectives. Composes with --quant int8.")
    p.add_argument("--tp", type=int, default=1,
                   help="Tensor-parallel degree: Megatron column/row sharding of "
                   "the transformer over the first N devices' 'model' mesh axis "
                   "(parallel/tensor_parallel.py), head-sharded flash attention. "
                   "Mutually exclusive with --pp; composes with --quant int8.")
    p.add_argument("--compilation_cache", type=str, default="auto",
                   help="Persistent XLA compilation cache: 'auto' (default, "
                   "~/.cache/ragb_vae_tpu/xla_cache), 'off', or a directory. "
                   "Full-scale sampler compiles are minutes-long on TPU; with "
                   "the cache they are paid once per machine, not per process.")
    return p.parse_args(argv)


def run(args: argparse.Namespace) -> None:
    import jax
    import jax.numpy as jnp

    from ragb_vae_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache(getattr(args, "compilation_cache", "auto"))

    from ragb_vae_tpu.data.image_io import load_rgba, save_rgba
    from ragb_vae_tpu.models.flux_kontext_textalpha import (
        FluxTextAlphaModel,
        read_lora_metadata,
    )

    dtype = {"bf16": jnp.bfloat16, "fp16": jnp.bfloat16, "fp32": jnp.float32}[args.precision]

    if args.lora_path:
        meta = read_lora_metadata(args.lora_path)
        if meta:
            if meta.get("rank") is not None:
                args.rank = int(meta["rank"])
            alpha = meta.get("lora_alpha", meta.get("alpha"))
            if alpha is not None:
                args.lora_alpha = int(alpha)
            print(f"Loaded LoRA metadata: rank={args.rank} alpha={args.lora_alpha}")

    from ragb_vae_tpu.parallel.bootstrap import (
        build_pipelined_transformer,
        build_tp_mesh,
        validate_tp_pp,
    )

    validate_tp_pp(args.tp, args.pp)
    mesh = build_tp_mesh(args.tp)

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
    # single-chip fast path: fused whole-block kernels on TPU (faster than
    # per-sample slicing at every batch since the subpixel-upsample kernel,
    # benchmarks/results.md); sliced XLA elsewhere
    if jax.default_backend() == "tpu":
        model.vae.enable_fused()
    else:
        model.vae.enable_slicing()

    if args.pp > 1:
        from ragb_vae_tpu.parallel.pipeline import pipelined_sample

        pipe = build_pipelined_transformer(
            model, args.pp, dtype=dtype, weight_quant=args.quant,
            lora_rank=args.rank if args.lora_path else 0,
            lora_alpha=float(args.lora_alpha),
        )
        stage_params = pipe.place_params(t_params)
        vae_params = jax.device_put(vae_params)

        def run_sample(t_params_unused, vae_params, batch, key):
            return pipelined_sample(
                model, pipe, stage_params, vae_params, batch,
                num_inference_steps=args.steps, key=key,
            )
    elif mesh is not None:
        from ragb_vae_tpu.parallel.tensor_parallel import (
            shard_transformer_params,
            sharded_sample_fn,
        )

        from jax.sharding import NamedSharding, PartitionSpec as P

        t_params, t_shardings = shard_transformer_params(t_params, mesh)
        vae_params = jax.device_put(vae_params, NamedSharding(mesh, P()))
        tp_sample = sharded_sample_fn(
            model, mesh, num_inference_steps=args.steps, shardings=t_shardings
        )

        def run_sample(t_params, vae_params, batch, key):
            return tp_sample(t_params, vae_params, batch, key)
    else:
        # place once: checkpoints load as host numpy, and jit re-transfers
        # numpy arguments on EVERY call — in batch mode that re-ships the
        # whole transformer tree (11.1 GiB at full-scale int8) per chunk
        t_params = jax.device_put(t_params)
        vae_params = jax.device_put(vae_params)

        def run_sample(t_params, vae_params, batch, key):
            return model.sample(
                t_params, vae_params, batch, num_inference_steps=args.steps, key=key
            )

    paths = _resolve_inputs(args.input_image)
    key = jax.random.PRNGKey(args.seed if args.seed is not None else 0)

    if len(paths) == 1:
        inp = load_rgba(paths[0])[None]  # (1, H, W, 4) in [0, 1]
        pred = run_sample(t_params, vae_params, jnp.asarray(inp), key)
        save_rgba(np.asarray(pred[0]), args.output_path)
        print(f"Saved to {args.output_path}")
        return

    # batch mode: group same-sized images (one compile per size) and run
    # the jitted sampler at up to --batch_size images per step
    from pathlib import Path

    out_dir = Path(args.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    by_size: dict = {}
    for path in paths:
        arr = load_rgba(path)
        by_size.setdefault(arr.shape[:2], []).append((path, arr))
    done = 0
    # dedup across the WHOLE run: same-stem inputs land in different chunks
    # (different sizes, or more than batch_size of them), and a per-chunk
    # list would let the later one silently overwrite the earlier output
    used: set = set()
    for size, items in sorted(by_size.items()):
        for start in range(0, len(items), max(1, args.batch_size)):
            chunk = items[start : start + max(1, args.batch_size)]
            batch = jnp.asarray(np.stack([arr for _, arr in chunk]))
            key, sub = jax.random.split(key)
            preds = np.asarray(run_sample(t_params, vae_params, batch, sub))
            outs = []
            for path, _ in chunk:
                out = out_dir / (Path(path).stem + "_text_alpha.png")
                n = 1
                while out in used:  # same stem from different input dirs
                    out = out_dir / (Path(path).stem + f"_text_alpha_{n}.png")
                    n += 1
                used.add(out)
                outs.append(out)
            from ragb_vae_tpu.data import native_io

            if native_io.available():
                # threaded C++ batch encode (native/rgba_io.cpp)
                native_io.encode_batch(outs, np.clip(preds, 0.0, 1.0))
            else:
                for out, pred in zip(outs, preds):
                    save_rgba(pred, out)
            done += len(chunk)
    print(f"Saved {done} predictions to {out_dir}")


def _resolve_inputs(spec: str):
    """Single file, directory, or glob -> ordered list of image paths."""
    import glob as _glob
    from pathlib import Path

    p = Path(spec)
    if p.is_file():
        return [p]
    if p.is_dir():
        exts = {".png", ".webp", ".jpg", ".jpeg"}
        found = sorted(q for q in p.iterdir() if q.suffix.lower() in exts)
    else:
        found = sorted(Path(q) for q in _glob.glob(spec))
    if not found:
        raise FileNotFoundError(f"No input images match {spec!r}")
    return found


def main(argv=None) -> None:
    run(parse_args(argv))

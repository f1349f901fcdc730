"""Flux-Kontext text-alpha LoRA training stage — TPU-native.

Parity with the reference stage
(src/training/flux_kontext_textalpha_lora.py:79-463): same argparse
surface, the same YAML->args overlay with synonym mapping
(ckpt_every_steps->save_every, val_every_steps->val_every,
val_max_batches->val_max_samples), AdamW(β1=0.9, β2=0.95) + cosine
anneal over LoRA params only, periodic peft-format LoRA saves with
metadata.json, and GT|pred RGBA pair dumps for visual validation.

TPU re-architecture: the transformer's base weights are a frozen closure
constant of one jitted train step; only the LoRA pytree (plus optimizer
state) flows through the step. The batch is sharded over the data mesh
axis; gradient reduction is XLA's (replacing accelerate/DDP).
"""
from __future__ import annotations

import argparse
import os
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ragb_vae_tpu.data.loader import DataLoader
from ragb_vae_tpu.data.sampler import BucketBatchSampler
from ragb_vae_tpu.data.text_alpha_dataset import TextAlphaBucketDataset
from ragb_vae_tpu.models.flux_kontext_textalpha import (
    FluxTextAlphaModel,
    write_lora_metadata,
)
from ragb_vae_tpu.models.flux_weights import merge_params, split_lora_params
from ragb_vae_tpu.parallel import (
    batch_sharding,
    create_mesh,
    put_global_batch,
    replicated,
    zero_sharding,
)
from ragb_vae_tpu.training.rgba_vae_stage import (
    pad_to_multiple,
    padding_weights,
    _to_uint8,
)

Array = jnp.ndarray


def _resolve_env_token(value: Optional[str]) -> Optional[str]:
    """`${env:VAR}` indirection for tokens (reference :35-45)."""
    if not value:
        return value
    if value.startswith("${env:") and value.endswith("}"):
        return os.environ.get(value[len("${env:"):-1])
    return value


def parse_args(args: Optional[List[str]] = None, *, allow_missing: bool = False) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="FLUX-Kontext LoRA for text_alpha latent prediction."
    )
    required = not allow_missing
    parser.add_argument("--pretrained_model_name_or_path", type=str, required=required, default=None)
    parser.add_argument("--hf_token", type=str, default=None)
    parser.add_argument("--rgba_vae_path", type=str, required=required, default=None)
    parser.add_argument("--vae_subfolder", type=str, default="ae")
    parser.add_argument("--data_root", type=str, required=required, default=None)
    parser.add_argument("--train_split", type=str, default="train")
    parser.add_argument("--val_split", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--val_batch_size", type=int, default=1)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--weight_decay", type=float, default=0.01)
    parser.add_argument("--adam_beta1", type=float, default=0.9)
    parser.add_argument("--adam_beta2", type=float, default=0.95)
    parser.add_argument("--adam_eps", type=float, default=1e-8)
    parser.add_argument("--max_train_steps", type=int, default=10000)
    parser.add_argument("--log_every", type=int, default=50)
    parser.add_argument("--save_every", type=int, default=1000)
    parser.add_argument("--ckpt_dir", type=str, default="checkpoints/flux_kontext_textalpha_lora")
    parser.add_argument("--output_dir", type=str, default="outputs/flux_kontext_textalpha_lora")
    parser.add_argument(
        "--val_output_dir", type=str, default="outputs/flux_kontext_textalpha_lora/val_samples"
    )
    parser.add_argument("--val_every", type=int, default=1000)
    parser.add_argument("--val_max_samples", type=int, default=100)
    parser.add_argument("--val_num_inference_steps", type=int, default=20)
    parser.add_argument("--run_validation_on_start", action="store_true")
    parser.add_argument("--mixed_precision", type=str, default="bf16")
    parser.add_argument("--grad_accum_steps", type=int, default=1)
    parser.add_argument("--seed", type=int, default=1337)
    parser.add_argument("--rank", type=int, default=96)
    parser.add_argument("--lora_alpha", type=int, default=128)
    parser.add_argument("--drop_last", action="store_true")
    parser.add_argument("--interleave_buckets", action="store_true")
    parser.add_argument("--max_grad_norm", type=float, default=1.0)
    parser.add_argument(
        "--resume_from", type=str, default=None,
        help="LoRA checkpoint dir to resume from (adapters + optimizer state "
             "+ step + RNG), or 'auto' to pick the newest checkpoint-* under "
             "ckpt_dir. Beyond-parity: the reference LoRA stage is save-only.",
    )
    parser.add_argument(
        "--weight_quant", type=str, default="none", choices=["none", "int8"],
        help="QLoRA-style training: store the FROZEN transformer base in "
             "weight-only int8 (models/quantize.py) — full-scale FLUX.1 LoRA "
             "fits one 16 GB chip (~11.1 GiB base vs 22.2 GiB bf16). Gradients "
             "flow only to the fp32 adapters; each layer dequantizes its own "
             "kernel, so training numerics see bf16 weights as usual.",
    )
    parser.add_argument(
        "--shard_base_params", action="store_true",
        help="FSDP-style sharding of the frozen transformer base over the data "
             "axis (needed when the base does not fit replicated per chip).",
    )
    parser.add_argument(
        "--tensor_parallel", type=int, default=1,
        help="Megatron tensor parallelism for the frozen base: a (data, "
             "model) mesh with the base column/row-sharded over `model` "
             "(parallel/tensor_parallel.py), batch on `data`, LoRA adapters "
             "replicated. On multi-slice pods the model axis is pinned "
             "inside a slice so its per-layer all-reduces ride ICI "
             "(parallel.create_dp_tp_mesh). Mutually exclusive with "
             "--shard_base_params.",
    )
    parser.add_argument(
        "--sequence_parallel", type=int, default=1,
        help="Sequence parallelism: the packed cond+target token streams "
             "shard over an `sp` mesh axis; attention keeps q local and "
             "all-gathers k/v inside its shard_map (exact numerics, "
             "tests/test_sequence_parallel.py). Composes with "
             "--tensor_parallel on a (data, model, sp) mesh. Like tp, the "
             "sp axis stays inside a slice on multi-slice pods.",
    )
    return parser.parse_args(args=args)


def latest_complete_lora_checkpoint(root: Path) -> Optional[Path]:
    """Newest COMMITTED checkpoint-N dir under `root`, or None.

    save_lora writes weights -> metadata -> train_state.msgpack, so the
    msgpack is the commit marker: a crash mid-save leaves a dir without
    it, which `resume_from: auto` must skip — resuming warm adapters with
    a fresh optimizer/step would silently restart the cosine schedule on
    a half-written checkpoint.
    """
    if not root.exists():
        return None

    def _is_complete(p: Path) -> bool:
        return (p / "pytorch_lora_weights.safetensors").exists() and (
            p / "train_state.msgpack"
        ).exists()

    candidates = sorted(
        (p for p in root.glob("checkpoint-*") if p.is_dir() and _is_complete(p)),
        key=lambda p: int(p.name.rsplit("-", 1)[1]),
    )
    return candidates[-1] if candidates else None


def _save_pair(gt: np.ndarray, pred: np.ndarray, path: Path) -> None:
    """GT|pred side-by-side RGBA PNG (reference _save_pair)."""
    from PIL import Image

    gt_img = Image.fromarray(_to_uint8(gt), mode="RGBA")
    pred_img = Image.fromarray(_to_uint8(pred), mode="RGBA")
    w, h = gt_img.size
    canvas = Image.new("RGBA", (w * 2, h))
    canvas.paste(gt_img, (0, 0))
    canvas.paste(pred_img, (w, 0))
    canvas.save(path)


def train(args: argparse.Namespace) -> Dict[str, float]:
    tp = max(1, int(getattr(args, "tensor_parallel", 1) or 1))
    sp = max(1, int(getattr(args, "sequence_parallel", 1) or 1))
    if tp > 1 and getattr(args, "shard_base_params", False):
        raise ValueError(
            "tensor_parallel and shard_base_params are mutually exclusive "
            "(Megatron model-axis sharding vs FSDP data-axis sharding of "
            "the same frozen base)"
        )
    if tp > 1 or sp > 1:
        from ragb_vae_tpu.parallel import create_training_mesh

        mesh = create_training_mesh(tp=tp, sp=sp)
    else:
        mesh = create_mesh()
    n_devices = mesh.devices.size
    # batch rows shard over the data axis only; the model axis (tp) holds
    # replicas of every row, so all batch math uses data_size, not n_devices
    data_size = mesh.shape["data"]
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0
    dtype = jnp.bfloat16 if args.mixed_precision in ("bf16", "fp16") else jnp.float32

    model, t_params, vae_params = FluxTextAlphaModel.from_pretrained(
        args.pretrained_model_name_or_path,
        vae_path=args.rgba_vae_path,
        vae_subfolder=args.vae_subfolder,
        dtype=dtype,
        lora_rank=args.rank,
        lora_alpha=float(args.lora_alpha),
        attention_mesh=mesh if n_devices > 1 else None,
        weight_quant=getattr(args, "weight_quant", "none"),
    )
    # mesh-aware per-device slicing for the cond/target VAE encodes
    # (v5e conv fast path, benchmarks/results.md)
    model.vae.enable_slicing(mesh=mesh)
    base_params, lora_params = split_lora_params(t_params)
    if dtype == jnp.bfloat16 and getattr(args, "weight_quant", "none") == "none":
        # The base is FROZEN: storing it at compute precision halves HBM
        # and FSDP all-gather traffic with no training-precision impact
        # (the reference likewise loads the transformer in bf16 under
        # accelerate mixed_precision bf16). LoRA params stay fp32.
        # host-side cast (numpy + ml_dtypes), so the fp32 copy never
        # touches HBM — device_put below places the bf16 shards directly.
        base_params = jax.tree_util.tree_map(
            lambda x: np.asarray(x).astype(jnp.bfloat16), base_params
        )
    rep = replicated(mesh)
    if tp > 1:
        # Megatron: q/k/v + MLP-up column-parallel, out/MLP-down
        # row-parallel over the model axis; one all-reduce per parallel
        # region, inserted by GSPMD. Works on the int8 tree too
        # (kernel_q shards like kernel). Grads parity vs single-device is
        # pinned in tests/test_dp_tp_training.py.
        from jax.sharding import NamedSharding, PartitionSpec
        from ragb_vae_tpu.parallel.tensor_parallel import transformer_param_specs

        specs = transformer_param_specs(base_params)
        base_params = jax.device_put(
            base_params,
            jax.tree_util.tree_map(
                lambda sp: NamedSharding(mesh, sp), specs,
                is_leaf=lambda x: isinstance(x, PartitionSpec),
            ),
        )
    elif getattr(args, "shard_base_params", False):
        # FSDP-style: frozen base sharded over the data axis; GSPMD inserts
        # the per-layer all-gathers. Fits FLUX-scale bases on 16GB chips.
        from ragb_vae_tpu.parallel import fsdp_sharding, shard_tree

        base_params = shard_tree(base_params, fsdp_sharding(base_params, mesh))
    else:
        base_params = jax.device_put(base_params, rep)
    lora_params = jax.device_put(lora_params, rep)
    vae_params = jax.device_put(vae_params, rep)

    train_ds = TextAlphaBucketDataset(Path(args.data_root), split=args.train_split)
    val_ds = (
        TextAlphaBucketDataset(Path(args.data_root), split=args.val_split)
        if args.val_split
        else None
    )
    if n_proc > 1 and args.batch_size % n_proc:
        raise ValueError(
            f"data.batch_size={args.batch_size} must divide by {n_proc} "
            "processes for multi-host input sharding"
        )
    train_sampler = BucketBatchSampler(
        train_ds.bucket_to_indices,
        batch_size=args.batch_size,
        shuffle=True,
        # multi-host: uniform per-host slices (see rgba_vae_stage notes)
        drop_last=args.drop_last or n_proc > 1,
        interleave=args.interleave_buckets,
        seed=args.seed,
    )
    train_dl = DataLoader(
        train_ds,
        batch_sampler=train_sampler,
        num_workers=args.num_workers,
        # bucket-pure batches: safe to decode only this host's slice
        process_shard=(jax.process_index(), n_proc) if n_proc > 1 else None,
    )
    val_dl = (
        DataLoader(
            val_ds,
            # bucket-pure batches: naive range batching would stack
            # different-resolution samples whenever val_batch_size > 1
            # and the val split spans more than one bucket
            batch_sampler=BucketBatchSampler(
                val_ds.bucket_to_indices,
                batch_size=args.val_batch_size,
                shuffle=True,
                seed=args.seed,
            ),
            num_workers=min(4, args.num_workers),
        )
        if val_ds is not None
        else None
    )

    lr_schedule = optax.cosine_decay_schedule(args.learning_rate, args.max_train_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(args.max_grad_norm)
        if args.max_grad_norm is not None
        else optax.identity(),
        optax.adamw(
            lr_schedule,
            b1=args.adam_beta1,
            b2=args.adam_beta2,
            eps=args.adam_eps,
            weight_decay=args.weight_decay,
        ),
    )
    opt_shapes = jax.eval_shape(tx.init, lora_params)
    opt_shardings = zero_sharding(opt_shapes, mesh)
    opt_state = jax.jit(tx.init, out_shardings=opt_shardings)(lora_params)

    n_micro = max(1, args.grad_accum_steps)

    def loss_fn(lora, batch, key):
        params = merge_params(base_params, lora)
        loss, stats = model.compute_loss(
            params, vae_params, batch["gt"], batch["text_alpha"], key,
            weights=batch.get("weights"),
        )
        return loss, stats

    from ragb_vae_tpu.parallel import accumulated_grads

    def step_fn(lora, opt_state, batch, key):
        loss, stats, grads = accumulated_grads(
            loss_fn, lora, batch, key, n_micro,
            micro_weight_fn=(
                (lambda mb: jnp.sum(mb["weights"]))
                if "weights" in batch else None
            ),
        )
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss, stats

    bsh = batch_sharding(mesh)
    train_step = jax.jit(
        step_fn,
        in_shardings=(rep, opt_shardings, bsh, rep),
        out_shardings=(rep, opt_shardings, rep, rep),
        donate_argnums=(0, 1),
    )

    # one loader batch = one optimizer step here (grad_accum splits it,
    # the data axis shards it) — the effective batch IS data.batch_size;
    # see MIGRATING.md for the mapping from the reference's per-device
    # accumulate() semantics
    print(
        f"[Batch] effective_per_step={args.batch_size} "
        f"(grad_accum={n_micro} x data_parallel={data_size} -> "
        f"{args.batch_size / max(n_micro * data_size, 1):g} rows per "
        f"device-microbatch) devices={n_devices} tensor_parallel={tp} "
        f"sequence_parallel={sp}"
    )
    print(f"[Train] {len(train_ds)} samples across {len(train_ds.bucket_to_indices)} buckets.")
    print(f"[Val]   {len(val_ds)} samples." if val_ds is not None else "[Val]   (disabled: no val_split provided)")
    n_lora = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(lora_params))
    print(f"[Params] trainable LoRA parameters: {n_lora:,}")

    sample_jit = jax.jit(
        lambda lora, gt, key: model.sample(
            merge_params(base_params, lora), vae_params, gt,
            num_inference_steps=args.val_num_inference_steps, key=key,
        )
    )

    def run_validation(step_label: str, key: jax.Array) -> None:
        if val_dl is None:
            return
        out_dir = Path(args.val_output_dir) / f"step-{step_label}"
        if is_main:
            out_dir.mkdir(parents=True, exist_ok=True)
        saved = 0
        for batch in val_dl:
            if saved >= args.val_max_samples:
                break
            gt_np = np.asarray(batch["gt"], np.float32)
            n_real_v = gt_np.shape[0]
            key, sub = jax.random.split(key)
            if n_proc > 1:
                # val loader is unsharded (every host holds the identical
                # batch): pad to the global mesh, sample sharded, gather
                from jax.experimental import multihost_utils

                gt_dev = put_global_batch(
                    pad_to_multiple(gt_np, data_size), bsh, is_global=True
                )
                decoded = np.asarray(
                    multihost_utils.process_allgather(
                        sample_jit(lora_params, gt_dev, sub), tiled=True
                    )
                )[:n_real_v]
            else:
                decoded = np.asarray(
                    sample_jit(lora_params, jnp.asarray(gt_np), sub)
                )
            names = batch.get("sample_name", ["val"])
            if isinstance(names, str):
                names = [names]
            for i in range(decoded.shape[0]):
                if saved >= args.val_max_samples:
                    break
                name = names[i] if i < len(names) else f"val_{saved}"
                if is_main:
                    _save_pair(gt_np[i], decoded[i], out_dir / f"{name}_pair.png")
                saved += 1
        print(f"[val-{step_label}] saved {saved} GT|pred pairs to {out_dir}")

    from flax import serialization

    def _host_opt_state():
        # ZeRO-sharded state has non-addressable shards on multi-host:
        # gather collectively (every process must call this together)
        if n_proc > 1:
            from jax.experimental import multihost_utils

            return multihost_utils.process_allgather(opt_state, tiled=True)
        return jax.device_get(opt_state)

    def save_lora(step: int, subdir: str) -> None:
        host_opt = _host_opt_state()  # collective — before the is_main gate
        if not is_main:
            return
        save_dir = Path(args.ckpt_dir) / subdir
        # adapters only: merging the frozen base in would force
        # lora_state_dict to walk (and with a sharded base, device_get)
        # the full transformer tree per save just to discard it
        model.save_lora_weights(lora_params, save_dir)
        write_lora_metadata(
            save_dir,
            model_id=str(args.pretrained_model_name_or_path),
            rank=args.rank,
            lora_alpha=float(args.lora_alpha),
            dtype=str(np.dtype(dtype).name) if dtype != jnp.bfloat16 else "bfloat16",
            step=step,
        )
        # Beyond-parity resume state (reference LoRA stage is save-only,
        # flux_kontext_textalpha_lora.py:315-323): optimizer state + RNG key
        # alongside the peft-format adapters. Written LAST — this file is
        # the commit marker `resume_from: auto` keys on.
        resume_state = {"opt_state": host_opt, "key": jax.device_get(key)}
        (save_dir / "train_state.msgpack").write_bytes(serialization.to_bytes(resume_state))
        print(f"[ckpt] saved LoRA weights to {save_dir}")

    from ragb_vae_tpu.utils.metrics_logger import MetricsLogger

    metrics_logger = MetricsLogger(args.ckpt_dir if is_main else None)

    key = jax.random.PRNGKey(args.seed)
    total_steps = 0

    resume_dir = getattr(args, "resume_from", None)
    if resume_dir == "auto":
        resume_dir = latest_complete_lora_checkpoint(Path(args.ckpt_dir))
        if resume_dir is None:
            print("[resume] resume_from: auto — no complete checkpoint found, starting fresh")
    if resume_dir:
        from ragb_vae_tpu.models.flux_kontext_textalpha import read_lora_metadata
        from ragb_vae_tpu.models.flux_weights import peft_state_to_lora_params
        from ragb_vae_tpu.models.weights import load_torch_state

        resume_dir = Path(resume_dir)
        lora_host = peft_state_to_lora_params(
            load_torch_state(resume_dir / "pytorch_lora_weights.safetensors")
        )
        lora_params = jax.device_put(lora_host, rep)
        state_file = resume_dir / "train_state.msgpack"
        if state_file.exists():
            if n_proc > 1:
                from jax.experimental import multihost_utils

                opt_template = multihost_utils.process_allgather(opt_state, tiled=True)
            else:
                opt_template = jax.device_get(opt_state)
            template = {"opt_state": opt_template, "key": jax.device_get(key)}
            restored = serialization.from_bytes(template, state_file.read_bytes())
            opt_state = jax.device_put(restored["opt_state"], opt_shardings)
            key = jnp.asarray(restored["key"])
        meta = read_lora_metadata(resume_dir) or {}
        total_steps = int(meta.get("step", 0))
        print(f"[resume] resumed LoRA training from {resume_dir} at step {total_steps}")

    if args.run_validation_on_start:
        key, sub = jax.random.split(key)
        run_validation("start", sub)

    from ragb_vae_tpu.utils.preemption import PreemptionGuard, preemption_enabled

    last_loss = float("nan")
    loss = None
    preempted = False
    t0 = time.time()
    epoch = 0
    guard = PreemptionGuard(
        enabled=preemption_enabled({"handle_preemption": getattr(args, "handle_preemption", True)})
    )
    if len(train_dl) == 0:
        # an empty index stream (split typo, batch_size larger than every
        # bucket with drop_last, empty dataset) would make the while loop
        # below spin epochs forever without a step — fail loudly instead
        raise ValueError(
            f"training dataloader yields no batches: {len(train_ds)} samples "
            f"in '{args.train_split}' with batch_size={args.batch_size}, "
            f"drop_last={args.drop_last or n_proc > 1}"
        )
    with guard:
      while total_steps < args.max_train_steps and not preempted:
        train_dl.set_epoch(epoch)
        for batch in train_dl:
            n_real = np.asarray(batch["gt"]).shape[0]
            # multi-host: each host decoded only its slice — pad locally to
            # the per-host share of the pad multiple and assemble the global
            # array without cross-host transfers (parallel.put_global_batch;
            # single-process this degenerates to a plain device_put)
            sharded_in = n_proc > 1 and "global_batch_size" in batch
            pad_mult = ((data_size // n_proc) if sharded_in else data_size) * n_micro
            gt = pad_to_multiple(np.asarray(batch["gt"], np.float32), pad_mult)
            ta = pad_to_multiple(
                np.asarray(batch["text_alpha"], np.float32), pad_mult
            )
            is_global = not sharded_in
            device_batch = {
                "gt": put_global_batch(gt, bsh, is_global=is_global),
                "text_alpha": put_global_batch(ta, bsh, is_global=is_global),
                "weights": put_global_batch(
                    padding_weights(n_real, gt.shape[0]), bsh, is_global=is_global
                ),
            }
            key, sub = jax.random.split(key)
            lora_params, opt_state, loss, _ = train_step(
                lora_params, opt_state, device_batch, sub
            )
            total_steps += 1

            if total_steps % args.log_every == 0:
                last_loss = float(np.asarray(loss))
                if not np.isfinite(last_loss):
                    raise FloatingPointError(f"Non-finite loss at step {total_steps}.")
                lr_now = float(lr_schedule(total_steps))
                metrics_logger.log({"train/loss": last_loss, "lr": lr_now}, step=total_steps)
                rate = total_steps / max(time.time() - t0, 1e-9)
                print(
                    f"[step {total_steps}] loss={last_loss:.4f} lr={lr_now:.6f} "
                    f"({rate:.2f} steps/s)",
                    flush=True,
                )
            if args.save_every and total_steps % args.save_every == 0:
                save_lora(total_steps, f"checkpoint-{total_steps}")
            if args.val_every and total_steps % args.val_every == 0 and total_steps > 0:
                key, sub = jax.random.split(key)
                run_validation(str(total_steps), sub)
            if guard.should_stop(sync=True):
                # Preemption: persist a resumable checkpoint-{N} (adapters +
                # opt state + RNG) and exit; `resume_from: auto` picks it up.
                preempted = True
                print(
                    f"[LoRA] preempted at step {total_steps} "
                    f"({guard.describe()}) — checkpointing and exiting",
                    flush=True,
                )
                save_lora(total_steps, f"checkpoint-{total_steps}")
                break
            if total_steps >= args.max_train_steps:
                break
        epoch += 1

    if not preempted:
        save_lora(args.max_train_steps, "final")
    print("Done." if not preempted else "Preempted.")
    if not np.isfinite(last_loss) and loss is not None:
        last_loss = float(np.asarray(loss))
    out = {"train/loss": last_loss, "global_step": float(total_steps)}
    if preempted:
        out["preempted"] = 1.0
    return out


def build_args_from_cfg(cfg: Dict[str, Any]) -> argparse.Namespace:
    """YAML {model, data, training} -> argparse namespace with the reference's
    synonym mapping (:349-448)."""
    model_cfg = cfg.get("model", {})
    data_cfg = cfg.get("data", {})
    train_cfg = cfg.get("training", {})
    args = argparse.Namespace(**vars(parse_args(args=[], allow_missing=True)))

    if model_cfg.get("pretrained_model_name_or_path"):
        args.pretrained_model_name_or_path = model_cfg["pretrained_model_name_or_path"]
    if model_cfg.get("hf_token"):
        args.hf_token = _resolve_env_token(model_cfg.get("hf_token"))
    if model_cfg.get("rgba_vae_path"):
        args.rgba_vae_path = model_cfg["rgba_vae_path"]
    if model_cfg.get("vae_subfolder") is not None:
        args.vae_subfolder = model_cfg["vae_subfolder"]

    if data_cfg.get("root"):
        args.data_root = data_cfg["root"]
    for src, dst, cast in (
        ("train_split", "train_split", str),
        ("val_split", "val_split", str),
        ("batch_size", "batch_size", int),
        ("val_batch_size", "val_batch_size", int),
        ("num_workers", "num_workers", int),
        ("drop_last", "drop_last", bool),
        ("interleave_buckets", "interleave_buckets", bool),
    ):
        if data_cfg.get(src) is not None:
            setattr(args, dst, cast(data_cfg[src]))

    for src, dst, cast in (
        ("mixed_precision", "mixed_precision", str),
        ("grad_accum_steps", "grad_accum_steps", int),
        ("learning_rate", "learning_rate", float),
        ("weight_decay", "weight_decay", float),
        ("adam_beta1", "adam_beta1", float),
        ("adam_beta2", "adam_beta2", float),
        ("adam_eps", "adam_eps", float),
        ("max_train_steps", "max_train_steps", int),
        ("log_every", "log_every", int),
        ("save_every", "save_every", int),
        ("ckpt_every_steps", "save_every", int),  # synonym
        ("ckpt_dir", "ckpt_dir", str),
        ("output_dir", "output_dir", str),
        ("val_output_dir", "val_output_dir", str),
        ("val_every", "val_every", int),
        ("val_every_steps", "val_every", int),  # synonym
        ("val_max_samples", "val_max_samples", int),
        ("val_num_inference_steps", "val_num_inference_steps", int),
        ("run_validation_on_start", "run_validation_on_start", bool),
        ("rank", "rank", int),
        ("lora_alpha", "lora_alpha", int),
        ("max_grad_norm", "max_grad_norm", float),
        ("resume_from", "resume_from", str),
        ("shard_base_params", "shard_base_params", bool),
        ("tensor_parallel", "tensor_parallel", int),
        ("sequence_parallel", "sequence_parallel", int),
        ("weight_quant", "weight_quant", str),
        ("handle_preemption", "handle_preemption", bool),
        ("seed", "seed", int),
    ):
        if train_cfg.get(src) is not None:
            setattr(args, dst, cast(train_cfg[src]))
    if train_cfg.get("val_max_batches") is not None:
        args.val_max_samples = int(train_cfg["val_max_batches"]) * args.val_batch_size

    missing = []
    if not args.pretrained_model_name_or_path:
        missing.append("model.pretrained_model_name_or_path")
    if not args.rgba_vae_path:
        missing.append("model.rgba_vae_path")
    if not args.data_root:
        missing.append("data.root")
    if missing:
        raise ValueError(f"Missing required config fields: {', '.join(missing)}")
    return args


def train_from_config(cfg: Dict[str, Any]) -> Dict[str, float]:
    return train(build_args_from_cfg(cfg))


def main() -> None:
    train(parse_args())


if __name__ == "__main__":
    main()

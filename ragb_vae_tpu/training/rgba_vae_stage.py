"""RGBA-VAE training stage (Stage 1) — TPU-native step loop.

Behavioral parity with the reference `train_rgba_vae`
(src/training/rgba_vae_stage.py:242-572) re-architected for XLA:

- One SPMD program over a `Mesh(("data",))` replaces the
  Accelerator/DeepSpeed process group; the batch is sharded on the data
  axis and XLA inserts the gradient reduction (NCCL all-reduce equivalent).
- The entire hot loop body (triplet -> encode -> sample -> decode -> loss
  -> clip -> AdamW) is one jitted function per bucket shape
  (`vae_step.make_train_step`), with optimizer state ZeRO-sharded
  (DeepSpeed ZeRO-2 equivalent) and grad accumulation as an in-step scan.
- Host keeps only data loading (threaded PIL decode + prefetch) and
  logging; metrics are fetched at log cadence so device dispatch stays
  async. The reference's per-step `_ensure_finite` NaN guard
  (rgba_vae_stage.py:38-44) runs whenever metrics are materialized
  (`nan_check_every`, default = log_every; set 1 for strict parity).
"""
from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ragb_vae_tpu.config import dtype_from_str
from ragb_vae_tpu.data.component_dataset import create_component_dataloader
from ragb_vae_tpu.data.bucket_dataset import MixedBucketDataset
from ragb_vae_tpu.data.loader import DataLoader, default_collate
from ragb_vae_tpu.data.manifest import build_bucket_entries
from ragb_vae_tpu.data.multilayer_dataset import MultiLayerDataset, multilayer_collate
from ragb_vae_tpu.data.sampler import BucketBatchSampler
from ragb_vae_tpu.data.transforms import RandomBackgroundBlend
from ragb_vae_tpu.models.losses import AlphaVaeLossConfig
from ragb_vae_tpu.models.rgba_vae import RgbaVAE
from ragb_vae_tpu.ops.rgba import composite_over_checkerboard
from ragb_vae_tpu.parallel import (
    batch_sharding,
    create_mesh,
    put_global_batch,
    replicated,
)
from ragb_vae_tpu.training import checkpoint as ckpt_lib
from ragb_vae_tpu.training.vae_step import (
    VaeStepConfig,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# Guards / logging helpers
# ---------------------------------------------------------------------------
def ensure_finite(value: float, name: str, *, epoch: int, step: int) -> None:
    """Host-side NaN/Inf guard (reference `_ensure_finite`,
    rgba_vae_stage.py:38-44): raises and kills the run."""
    if not np.isfinite(value):
        raise FloatingPointError(
            f"Non-finite {name}={value!r} at epoch {epoch} step {step}."
        )


def log_batch_and_buckets(
    *,
    batch_size: int,
    grad_accum: int,
    num_devices: int,
    train_loader: Optional[DataLoader],
) -> None:
    """Startup diagnostics (reference `_log_batch_and_buckets`,
    rgba_vae_stage.py:51-82): effective batch math + top-5 bucket occupancy.

    Semantics differ from the reference and the print must not pretend
    otherwise: HERE one loader batch of `data.batch_size` rows is one
    optimizer step — grad_accum splits it into microbatches and the mesh
    shards it, so the per-step effective batch IS data.batch_size. In the
    reference, data.batch_size is per-device and accumulate() spans accum
    loader batches (effective = batch x accum x world). MIGRATING.md
    documents the mapping (set batch_size = ref_batch x accum x world to
    reproduce reference dynamics)."""
    per_slice = batch_size / max(grad_accum * num_devices, 1)
    print(
        f"[RGBA-VAE] effective batch/step = data.batch_size = {batch_size} "
        f"(split into {grad_accum} microbatch(es) over {num_devices} "
        f"device(s): {per_slice:g} rows per device-microbatch; reference"
        f"-equivalent config would be batch/device "
        f"{batch_size}/accum/devices — see MIGRATING.md)"
    )
    dataset = getattr(train_loader, "dataset", None)
    buckets = getattr(dataset, "bucket_to_indices", None)
    if buckets:
        top = sorted(buckets.items(), key=lambda kv: -len(kv[1]))[:5]
        occupancy = ", ".join(f"{k}:{len(v)}" for k, v in top)
        print(f"[RGBA-VAE] top-5 buckets: {occupancy} ({len(buckets)} buckets total)")


# ---------------------------------------------------------------------------
# Dataloaders (parity with build_dataloader, rgba_vae_stage.py:133-239)
# ---------------------------------------------------------------------------
def build_dataloader(cfg: Dict[str, Any], *, split: Optional[str] = None) -> DataLoader:
    data_cfg = cfg.get("data", {})
    source = data_cfg.get("source", "multilayer")
    target_split = split or "train"
    train_mode = target_split == "train"
    val_shuffle = bool(data_cfg.get("val_shuffle", False))
    seed = data_cfg.get("seed")

    # Multi-host input sharding (data.shard_by_process, default on): every
    # process iterates the SAME seeded index stream — hosts agree on batch
    # boundaries and bucket choices — but decodes only its contiguous slice
    # (the per-host half of the reference's accelerate DataLoader sharding).
    # drop_last is forced so per-host row counts stay uniform; the stage
    # reassembles the global array via parallel.put_global_batch.
    shard_kwargs: Dict[str, Any] = {}
    force_drop_last = False
    if train_mode and bool(data_cfg.get("shard_by_process", True)) and jax.process_count() > 1:
        n_proc = jax.process_count()
        if int(data_cfg.get("batch_size", 4)) % n_proc:
            raise ValueError(
                f"data.batch_size={data_cfg.get('batch_size')} must divide by "
                f"{n_proc} processes for multi-host input sharding"
            )
        shard_kwargs = {"process_shard": (jax.process_index(), n_proc)}
        force_drop_last = True
        if seed is None:
            # the sharding contract above REQUIRES a shared index stream;
            # with seed=None every host would shuffle with independent OS
            # entropy and silently assemble rows of different logical
            # batches. Pin a deterministic default instead of desyncing.
            seed = 0
            print(
                "[data] multi-host input sharding with no data.seed — "
                "defaulting to seed=0 so all hosts iterate one index stream"
            )

    if source == "bucket":
        dataset_kwargs = data_cfg.get("dataset_kwargs", {"include_metadata": False})
        val_dataset_kwargs = data_cfg.get("val_dataset_kwargs", dataset_kwargs)
        use_mixed = bool(data_cfg.get("bucket_datasets"))

        if target_split == "val":
            split_name = data_cfg.get("bucket_val_split", "val")
            shuffle = val_shuffle
            extra_kwargs = val_dataset_kwargs
        else:
            split_name = data_cfg.get("bucket_split", "train")
            shuffle = data_cfg.get("shuffle", True)
            extra_kwargs = dataset_kwargs

        transform = None
        if train_mode:
            blend_prob = float(data_cfg.get("background_blend_prob", 0.0))
            if blend_prob > 0.0:
                targets = data_cfg.get("background_blend_targets", ["component", "composite"])
                color_range = tuple(data_cfg.get("background_color_range", [0.2, 0.9]))
                transform = RandomBackgroundBlend(
                    prob=blend_prob, keys=targets, color_range=color_range, seed=seed
                )

        if not use_mixed:
            return create_component_dataloader(
                root_dir=data_cfg.get("bucket_root", "data/rgba_layers"),
                manifest_path=data_cfg.get("bucket_manifest"),
                split=split_name,
                batch_size=data_cfg.get("batch_size", 4),
                shuffle=shuffle,
                num_workers=data_cfg.get("num_workers", 4),
                limit=data_cfg.get("limit"),
                transform=transform,
                dataset_kwargs=extra_kwargs,
                seed=seed,
                # NOT process-sharded: pad_collate pads to the LOCAL batch
                # max, so per-host shapes could diverge — hosts decode the
                # full batch and the stage slices it (put_global_batch
                # is_global=True). drop_last still keeps batches uniform.
                drop_last=force_drop_last or bool(data_cfg.get("drop_last", False)),
            )

        bucket_entries = build_bucket_entries(
            data_cfg.get("bucket_datasets", []), split=split_name
        )
        if not bucket_entries:
            raise ValueError("No bucket entries found for configured bucket_datasets.")
        limit = data_cfg.get("limit")
        if limit is not None:
            bucket_entries = bucket_entries[: int(limit)]

        dataset = MixedBucketDataset(
            root_dir=data_cfg.get("bucket_root", "data/rgba_layers"),
            entries=bucket_entries,
            include_metadata=extra_kwargs.get("include_metadata", False),
            include_background=extra_kwargs.get("include_background", False),
            blend_component_to_white=extra_kwargs.get("blend_component_to_white", False),
            transform=transform,
        )
        batch_sampler = BucketBatchSampler(
            dataset.bucket_to_indices,
            batch_size=data_cfg.get("batch_size", 4),
            shuffle=shuffle,
            drop_last=force_drop_last or bool(data_cfg.get("drop_last", False)),
            interleave=bool(data_cfg.get("interleave_buckets", False)),
            seed=seed,
        )
        return DataLoader(
            dataset,
            batch_sampler=batch_sampler,
            num_workers=data_cfg.get("num_workers", 4),
            collate_fn=default_collate,
            **shard_kwargs,
        )

    ds = MultiLayerDataset(
        rendered_root=Path(data_cfg["rendered_root"]),
        json_root=Path(data_cfg["json_root"]),
        alpha_threshold=data_cfg.get("alpha_threshold", 100),
        max_samples=data_cfg.get("max_samples"),
    )
    should_shuffle = train_mode or (target_split == "val" and val_shuffle)
    return DataLoader(
        ds,
        batch_size=data_cfg.get("batch_size", 1),
        shuffle=should_shuffle,
        num_workers=data_cfg.get("num_workers", 4),
        collate_fn=multilayer_collate,
        seed=seed,
        drop_last=force_drop_last,  # unsharded: see component-path note
    )


# ---------------------------------------------------------------------------
# Batch construction (parity with build_training_batch, :575-603) — host side
# so the jitted step sees static shapes.
# ---------------------------------------------------------------------------
def build_training_batch(
    batch: Dict[str, Any],
    *,
    background_sample_prob: float = 0.0,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Concat component+composite (+prob-sampled background) -> (N, H, W, 4)."""
    tensors: List[np.ndarray] = []
    if "component" in batch and "composite" in batch:
        tensors.extend([batch["component"], batch["composite"]])
    elif "composite" in batch:
        tensors.append(batch["composite"])
    else:
        raise ValueError("Batch must contain 'composite' tensor for training.")
    inputs = np.concatenate([np.asarray(t) for t in tensors], axis=0)

    if background_sample_prob > 0.0 and "background" in batch:
        background = np.asarray(batch["background"])
        if background.ndim == 3:
            background = background[None]
        if background.shape[-1] != 4:
            raise ValueError("Background tensor is expected to have 4 channels (RGBA).")
        rng = rng or np.random.default_rng()
        mask = rng.random(background.shape[0]) < background_sample_prob
        if mask.any():
            inputs = np.concatenate([inputs, background[mask]], axis=0)
    return inputs


def pad_to_multiple(arr: np.ndarray, multiple: int) -> np.ndarray:
    """Cycle-pad the batch dim so it divides the mesh's data axis.

    The reference never pads (NCCL DP tolerates ragged per-rank batches);
    GSPMD batch sharding needs divisibility. Consumers neutralize the pad:
    the train step masks it out of the loss via `padding_weights`, and the
    eval loop slices metrics back to the real count.
    """
    n = arr.shape[0]
    if multiple <= 1 or n % multiple == 0:
        return arr
    pad = multiple - (n % multiple)
    reps = -(-pad // n)
    extra = np.concatenate([arr] * reps, axis=0)[:pad]
    return np.concatenate([arr, extra], axis=0)


def padding_weights(n_real: int, n_total: int) -> np.ndarray:
    """(n_total,) loss weights: 1 for real samples, 0 for pad samples —
    makes the step loss exactly invariant to `pad_to_multiple`."""
    weights = np.zeros(n_total, dtype=np.float32)
    weights[:n_real] = 1.0
    return weights


# ---------------------------------------------------------------------------
# Visual artifacts (PIL-based; parity with visualize_dataloader_samples
# :628-687 and save_validation_grid :798-872)
# ---------------------------------------------------------------------------
def _to_uint8(img01: np.ndarray) -> np.ndarray:
    return (np.clip(img01, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def _save_png(img01: np.ndarray, path: Path) -> None:
    from PIL import Image

    Image.fromarray(_to_uint8(img01)).save(path)


def visualize_dataloader_samples(
    dataloader: DataLoader,
    *,
    limit: int = 150,
    output_dir: str = "outputs/sample_vis",
    nrow: int = 10,
) -> int:
    """Dump checkerboard-composited RGBA samples; returns count saved."""
    del nrow  # reference renders one file per sample too; kept for API parity
    target_dir = Path(output_dir)
    target_dir.mkdir(parents=True, exist_ok=True)
    count = 0
    for batch in dataloader:
        tensor = batch.get("composite", batch.get("component"))
        if tensor is None:
            continue
        arr = np.asarray(tensor)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.min() < -0.01 or arr.max() > 1.01:
            arr = (arr + 1.0) * 0.5
        composed = np.asarray(composite_over_checkerboard(jnp.asarray(arr)))
        for img in composed:
            _save_png(img, target_dir / f"sample_{count:04d}.png")
            count += 1
            if count >= limit:
                break
        if count >= limit:
            break
    print(f"[RGBA-VAE] saved checkerboard previews to {target_dir} ({count} files)")
    return count


def save_validation_grid(
    samples: List[Dict[str, np.ndarray]],
    *,
    epoch: int,
    step: Optional[int],
    output_dir: str,
) -> Path:
    """GT | recon (checkerboard-composited) | alpha-diff rows, one PNG."""
    from PIL import Image

    panels = []
    for sample in samples:
        gt = np.asarray(sample["gt"], dtype=np.float32)
        recon = np.asarray(sample["recon"], dtype=np.float32)
        gt_c = np.asarray(composite_over_checkerboard(jnp.asarray(gt[None])))[0]
        rc_c = np.asarray(composite_over_checkerboard(jnp.asarray(recon[None])))[0]
        alpha_diff = np.abs(gt[..., 3:] - recon[..., 3:])
        alpha_rgb = np.repeat(alpha_diff, 3, axis=-1)
        panels.append(np.concatenate([gt_c, rc_c, alpha_rgb], axis=1))
    max_w = max(p.shape[1] for p in panels)
    padded = [
        np.pad(p, ((0, 0), (0, max_w - p.shape[1]), (0, 0))) if p.shape[1] < max_w else p
        for p in panels
    ]
    grid = np.concatenate(padded, axis=0)

    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    name = (
        f"val_recon_epoch_{epoch}_step_{step}.png" if step is not None else f"val_recon_epoch_{epoch}.png"
    )
    out_path = out_dir / name
    Image.fromarray(_to_uint8(grid)).save(out_path)
    print(f"[RGBA-VAE][val] saved visualization to {out_path}")
    return out_path


# ---------------------------------------------------------------------------
# Validation (parity with evaluate_rgba_vae, :718-784)
# ---------------------------------------------------------------------------
def resolve_background_spec(spec):
    """'white'/'black'/scalar/sequence -> background value
    (reference resolve_background_spec, rgba_vae_stage.py:787-795)."""
    if isinstance(spec, str):
        lowered = spec.lower()
        if lowered == "white":
            return 1.0
        if lowered == "black":
            return 0.0
        raise ValueError(f"Unknown background spec '{spec}'.")
    return spec


def evaluate_rgba_vae(
    model: RgbaVAE,
    params,
    dataloader: DataLoader,
    *,
    epoch: int,
    eval_cfg: Dict[str, Any],
    global_step: Optional[int] = None,
    mesh=None,
    eval_step=None,
    key: Optional[jax.Array] = None,
) -> Dict[str, float]:
    background_specs = list(eval_cfg.get("val_background_colors", ["white", "black"]))
    eval_step = eval_step or make_eval_step(
        model, mesh=mesh, background_specs=background_specs
    )
    key = key if key is not None else jax.random.PRNGKey(0)
    max_batches = eval_cfg.get("val_max_batches")
    n_devices = mesh.devices.size if mesh is not None else 1
    sharding = batch_sharding(mesh) if mesh is not None else None

    psnr_records: Dict[str, List[np.ndarray]] = {str(s): [] for s in background_specs}
    alpha_l1: List[np.ndarray] = []
    viz: List[Dict[str, np.ndarray]] = []
    viz_rows = int(eval_cfg.get("val_visual_rows", 8))

    for batch_idx, batch in enumerate(dataloader):
        inputs = build_training_batch(batch, background_sample_prob=0.0)
        n_real = inputs.shape[0]
        inputs = pad_to_multiple(inputs, n_devices)
        images = (
            put_global_batch(inputs, sharding, is_global=True)
            if sharding is not None
            else jnp.asarray(inputs)
        )
        key, sub = jax.random.split(key)
        out = eval_step(params, images, sub)
        if jax.process_count() > 1:
            # batch-sharded outputs have non-addressable shards: gather to
            # host numpy on every process (val loaders are unsharded, so
            # every host runs the identical eval and agrees on metrics)
            from jax.experimental import multihost_utils

            out = multihost_utils.process_allgather(out, tiled=True)
        for spec in background_specs:
            psnr_records[str(spec)].append(np.asarray(out[f"psnr_{spec}"])[:n_real])
        alpha_l1.append(np.asarray(out["alpha_mae"])[:n_real])
        if len(viz) < viz_rows:
            viz.append(
                {
                    "gt": np.clip(np.asarray(inputs[0], dtype=np.float32), 0.0, 1.0),
                    "recon": np.asarray(out["recon"][0], dtype=np.float32),
                }
            )
        if max_batches is not None and (batch_idx + 1) >= max_batches:
            break

    metrics: Dict[str, float] = {}
    if alpha_l1:
        for spec in background_specs:
            values = np.concatenate(psnr_records[str(spec)])
            metrics[f"val/psnr_{spec}"] = float(values.mean())
            print(
                f"[RGBA-VAE][val] epoch {epoch} PSNR ({spec} background): "
                f"{metrics[f'val/psnr_{spec}']:.2f} dB"
            )
        metrics["val/alpha_mae"] = float(np.concatenate(alpha_l1).mean())
        print(f"[RGBA-VAE][val] epoch {epoch} alpha MAE: {metrics['val/alpha_mae']:.4f}")
    if viz and jax.process_index() == 0:  # one writer on shared filesystems
        save_validation_grid(
            viz,
            epoch=epoch,
            step=global_step,
            output_dir=eval_cfg.get("val_output_dir", "outputs"),
        )
    return metrics


# ---------------------------------------------------------------------------
# Checkpoints (parity with save_checkpoints, :875-893, plus real resume)
# ---------------------------------------------------------------------------
def save_checkpoints(
    model: RgbaVAE, params, cfg: Dict[str, Any], *, step=None, opt_state=None,
    writer: Optional[ckpt_lib.AsyncCheckpointWriter] = None,
):
    train_cfg = cfg.get("training", {})
    ckpt_dir = Path(train_cfg.get("ckpt_dir", "checkpoints"))
    target = ckpt_lib.checkpoint_dir(ckpt_dir, step)
    kwargs = dict(
        config=model.config,
        params=params,
        opt_state=opt_state,
        step=step or 0,
    )
    if jax.process_count() > 1:
        # ZeRO-sharded opt state has non-addressable shards on every host:
        # gather to host numpy (collective — ALL processes must reach this
        # line), then only process 0 touches the filesystem (shared-FS safe;
        # the reference relies on accelerate's is_main_process the same way)
        from jax.experimental import multihost_utils

        kwargs["params"] = multihost_utils.process_allgather(params, tiled=True)
        if opt_state is not None:
            kwargs["opt_state"] = multihost_utils.process_allgather(
                opt_state, tiled=True
            )
        if jax.process_index() != 0:
            return target
    keep_last = int(train_cfg.get("ckpt_keep_last", 0) or 0)

    def _prune():
        # Runs strictly after the save lands (worker thread on the async
        # path) so retention never deletes the only complete checkpoint
        # while the new directory is still partially written.
        if keep_last > 0:
            removed = ckpt_lib.prune_checkpoints(ckpt_dir, keep_last)
            if removed:
                print(f"[ckpt] pruned {removed} old checkpoints (keep_last={keep_last})")

    if writer is not None:
        # d2h + file IO overlap the next training steps (async_checkpoint)
        writer.submit(target, on_complete=_prune, **kwargs)
    else:
        ckpt_lib.save_train_checkpoint(target, **kwargs)
        _prune()
    print(f"Saved RGBA-VAE checkpoints to {target}" + (f" (step {step})" if step else ""))
    return target


# ---------------------------------------------------------------------------
# The stage entry point (parity with train_rgba_vae, :242-572)
# ---------------------------------------------------------------------------
def train_rgba_vae(cfg: Dict[str, Any]) -> Dict[str, float]:
    model_cfg = cfg.get("model", {})
    train_cfg = cfg.get("training", {})
    data_cfg = cfg.get("data", {})

    mixed_precision = train_cfg.get("mixed_precision", "no")
    if isinstance(mixed_precision, bool):
        mixed_precision = "fp16" if mixed_precision else "no"
    if mixed_precision in ("bf16", "fp16", "float16", "bfloat16"):
        # fp16 has no TPU fast path; bf16 is the analogue for both.
        compute_dtype = jnp.bfloat16
    elif mixed_precision in ("no", "none", "fp32", "float32"):
        compute_dtype = jnp.float32
    else:
        compute_dtype = dtype_from_str(mixed_precision)

    mesh = create_mesh()
    n_devices = mesh.devices.size
    n_proc = jax.process_count()
    if n_proc > 1 and float(data_cfg.get("background_sample_prob", 0.0)) > 0.0:
        # per-host RNG over per-host slices would desync global row counts
        raise ValueError(
            "data.background_sample_prob > 0 is not supported on multi-host "
            "runs (hosts would disagree on the training-batch row count); "
            "set it to 0 or run single-host."
        )

    rgb_ckpt = model_cfg.get("rgb_checkpoint")
    if not rgb_ckpt:
        raise ValueError("model.rgb_checkpoint must point to the converted VAE directory.")
    base_arch = str(model_cfg.get("base_arch", "qwen")).lower()
    default_subfolder = "ae" if "flux" in base_arch else "vae"
    rgb_subfolder = model_cfg.get("rgb_subfolder")
    subfolder = default_subfolder if rgb_subfolder is None else rgb_subfolder

    model, params = RgbaVAE.from_pretrained_rgb(
        rgb_ckpt,
        subfolder=subfolder,
        alpha_bias_init=model_cfg.get("alpha_bias_init", 0.0),
        beta=model_cfg.get("beta", 0.25),
        alpha_loss_weight=model_cfg.get("alpha_loss_weight", 1.0),
        alpha_l1_weight=model_cfg.get("alpha_l1_weight", 0.0),
        rgb_loss_weight=model_cfg.get("rgb_loss_weight", 1.0),
        white_bg_weight=model_cfg.get("white_bg_loss_weight", 0.0),
        black_bg_weight=model_cfg.get("black_bg_loss_weight", 0.0),
        dtype=compute_dtype,
        # bool (reference enable_gradient_checkpointing parity) or the
        # string "half"/"all"/"none" for selective checkpointing
        remat=(lambda v: v if isinstance(v, str) else bool(v))(
            train_cfg.get("vae_gradient_checkpointing", False)
        ),
    )
    params = jax.device_put(params, replicated(mesh))

    # diffusers-parity knobs (reference :296-304), both defaulting ON like
    # the reference. Slicing here is MESH-AWARE: the batch is viewed as
    # (devices, local) and scanned over the local axis, so every chip runs
    # batch-1-shaped convs in parallel — the v5e conv fast path
    # (benchmarks/results.md) without serializing the sharded axis.
    if train_cfg.get("vae_tiling", True):
        model.enable_tiling(train_cfg.get("vae_tile_sample_size"))
    # fused whole-resnet-block Pallas kernels (forward AND the fused Pallas
    # backwards, ops/pallas/resnet_block.py) — DEFAULT ON for TPU training
    # since round 3: 4.572 vs 3.391 img/s at the 512^2 b4 accum-2 operating
    # point (benchmarks/results.md round 3). Mosaic kernels cannot be
    # auto-partitioned by GSPMD over a sharded batch axis, so multi-device
    # meshes run them only inside the explicit shard_map ZeRO-2 step (the
    # step body is per-device, same pattern as the shard_mapped flash
    # attention); the GSPMD train step keeps the sliced XLA path.
    zero_impl = str(train_cfg.get("zero_impl", "gspmd")).lower()
    eval_model = model
    if (
        train_cfg.get("fused_kernels", True)
        and jax.default_backend() == "tpu"
        and (n_devices == 1 or zero_impl == "shard_map")
    ):
        if n_devices > 1:
            # eval/vis run under GSPMD jit (batch-sharded), which cannot
            # partition the kernels: give them an unfused twin — the param
            # tree is identical, only the compute path differs.
            eval_model = dataclasses.replace(model, fused=False)
            if train_cfg.get("vae_slicing", True):
                eval_model.enable_slicing(mesh=mesh)
        model.enable_fused()
    elif train_cfg.get("vae_slicing", True):
        model.enable_slicing(mesh=mesh)

    train_loader = build_dataloader(cfg, split="train")
    val_loader = None
    if train_cfg.get("run_validation", True):
        try:
            val_loader = build_dataloader(cfg, split="val")
        except Exception as exc:
            print(f"[RGBA-VAE] no validation loader: {exc}")
            val_loader = None

    lr = float(train_cfg.get("learning_rate", 1e-4))
    epochs = int(train_cfg.get("epochs", 1))
    max_grad_norm = train_cfg.get("max_grad_norm")
    tx = make_optimizer(
        lr,
        betas=(0.5, 0.9),
        max_grad_norm=float(max_grad_norm) if max_grad_norm is not None else None,
    )

    lpips_scale = float(train_cfg.get("lpips_scale", 0.0) or 0.0)
    lpips_fn = None
    if lpips_scale > 0.0:
        from ragb_vae_tpu.models.lpips import maybe_build_lpips

        # VGG convs at the step's compute dtype (bf16 under mixed
        # precision — the reference's LPIPS runs under accelerate's bf16
        # autocast the same way); fp32 statistics stay inside.
        lpips_fn = maybe_build_lpips(
            train_cfg.get("lpips_weights"),
            compute_dtype=None if compute_dtype == jnp.float32 else compute_dtype,
            # training.lpips_remat=false keeps VGG slice activations
            # resident (skips the backward's 2 recompute passes) when the
            # envelope fits — see bench.py --lpips-no-remat A/B
            remat=bool(train_cfg.get("lpips_remat", True)),
        )
        if lpips_fn is None:
            print(
                "[RGBA-VAE] lpips_scale > 0 but no LPIPS weights available "
                "(set training.lpips_weights); perceptual term disabled."
            )
            lpips_scale = 0.0

    loss_cfg = AlphaVaeLossConfig(
        reduce_mean=bool(train_cfg.get("loss_reduce_mean", False)),
        use_naive_mse=bool(train_cfg.get("use_naive_mse", False)),
        eb=tuple(model_cfg.get("loss_eb") or AlphaVaeLossConfig.eb),
        eb2=tuple(model_cfg.get("loss_eb2") or AlphaVaeLossConfig.eb2),
    )
    step_cfg = VaeStepConfig(
        kl_scale=float(train_cfg.get("kl_scale") or 0.0),
        ref_kl_scale=float(train_cfg.get("ref_kl_scale") or 0.0),
        lpips_scale=lpips_scale,
        gradient_accumulation_steps=int(train_cfg.get("gradient_accumulation_steps", 1)),
        compute_dtype=compute_dtype,
    )

    ref_params = None
    if step_cfg.ref_kl_scale > 0.0:
        ref_ckpt = model_cfg.get("ref_rgb_checkpoint") or rgb_ckpt
        ref_rgb_subfolder = model_cfg.get("ref_rgb_subfolder")
        ref_subfolder = subfolder if ref_rgb_subfolder is None else ref_rgb_subfolder
        _, ref_params = RgbaVAE.from_pretrained_rgb(
            ref_ckpt,
            subfolder=ref_subfolder,
            alpha_bias_init=model_cfg.get("alpha_bias_init", 0.0),
            dtype=compute_dtype,
        )
        ref_params = jax.device_put(ref_params, replicated(mesh))

    sample_vis_count = int(train_cfg.get("sample_vis_count", 0) or 0)
    if sample_vis_count > 0 and jax.process_index() == 0:
        try:
            visualize_dataloader_samples(
                train_loader,
                limit=sample_vis_count,
                output_dir=train_cfg.get("sample_vis_dir", "outputs/sample_vis"),
                nrow=int(train_cfg.get("sample_vis_nrow", 10) or 10),
            )
        except Exception as exc:
            print(f"[RGBA-VAE] dataloader preview failed: {exc}")

    # zero_impl: "gspmd" (default — sharding annotations, XLA picks the
    # collectives) or "shard_map" (explicit reduce-scatter / per-shard
    # AdamW / all-gather, the literal DeepSpeed ZeRO-2 dataflow;
    # parallel/zero_step.py). Numerics match; shard_map is auditable.
    if zero_impl == "shard_map":
        from functools import partial as _partial

        from ragb_vae_tpu.parallel import init_zero2_state, make_zero2_train_step
        from ragb_vae_tpu.parallel.zero_step import zero2_optimizer
        from ragb_vae_tpu.training.vae_step import vae_loss_fn

        if step_cfg.gradient_accumulation_steps != 1:
            raise ValueError(
                "zero_impl: shard_map does not implement gradient accumulation;"
                " use the default gspmd implementation."
            )
        if train_cfg.get("optimizer_offload"):
            raise ValueError(
                "optimizer_offload is implemented for the default gspmd step;"
                " drop zero_impl: shard_map to combine it with ZeRO sharding."
            )
        z_tx = zero2_optimizer(lr, betas=(0.5, 0.9))
        loss_for_zero = _partial(
            vae_loss_fn,
            model=model,
            loss_cfg=loss_cfg,
            step_cfg=step_cfg,
            ref_params=ref_params,
            lpips_fn=lpips_fn,
        )

        def _zero_loss(p, batch, key):
            total, metrics = loss_for_zero(p, batch, key)
            return total, metrics

        opt_state = init_zero2_state(params, z_tx, mesh)
        train_step = make_zero2_train_step(
            _zero_loss,
            z_tx,
            mesh,
            max_grad_norm=float(max_grad_norm) if max_grad_norm is not None else None,
        )
    else:
        # optimizer_offload: AdamW moments live in pinned host memory
        # between steps (ZeRO-Offload; the reference's DeepSpeed knob is
        # offload_optimizer.device, configs/deepspeed_zero2.json:5-7) —
        # frees 2x param bytes of persistent HBM for activations.
        optimizer_offload = bool(train_cfg.get("optimizer_offload", False))
        opt_state = init_train_state(
            model, params, tx, mesh=mesh, offload=optimizer_offload
        )
        train_step = make_train_step(
            model,
            tx,
            loss_cfg,
            step_cfg,
            mesh=mesh,
            ref_params=ref_params,
            lpips_fn=lpips_fn,
            opt_state_example=jax.eval_shape(tx.init, params),
            offload_opt_state=optimizer_offload,
        )
    eval_step = (
        make_eval_step(
            eval_model,
            mesh=mesh,
            background_specs=list(
                train_cfg.get("val_background_colors", ["white", "black"])
            ),
        )
        if val_loader is not None
        else None
    )

    global_step = 0
    start_step = 0
    resume_from = train_cfg.get("resume_from")
    if resume_from == "auto":
        # resume from the newest step_* checkpoint if one exists
        resume_from = ckpt_lib.latest_checkpoint(train_cfg.get("ckpt_dir", "checkpoints"))
        if resume_from is None:
            print("[RGBA-VAE] resume_from: auto — no checkpoint found, starting fresh")
    if resume_from:
        if n_proc > 1:
            # ZeRO-sharded state has non-addressable shards: device_get
            # would raise — gather collectively (all hosts reach this line
            # because resume_from derives from the shared config/ckpt_dir)
            from jax.experimental import multihost_utils

            opt_template = multihost_utils.process_allgather(opt_state, tiled=True)
        else:
            opt_template = jax.device_get(opt_state)
        _, params_loaded, opt_loaded, meta = ckpt_lib.load_train_checkpoint(
            resume_from, opt_state_template=opt_template
        )
        params = jax.device_put(params_loaded, replicated(mesh))
        if opt_loaded is not None:
            opt_state = jax.device_put(opt_loaded, jax.tree_util.tree_map(lambda x: x.sharding, opt_state))
        start_step = int(meta.get("step", 0))
        global_step = start_step
        print(f"[RGBA-VAE] resumed from {resume_from} at step {start_step}")

    log_every = int(train_cfg.get("log_every", 50))
    nan_check_every = int(train_cfg.get("nan_check_every", log_every))
    ckpt_every_steps = int(train_cfg.get("ckpt_every_steps", 0) or 0)
    # async_checkpoint (default on): periodic saves hand device arrays to a
    # worker thread; d2h + file IO overlap training (checkpoint.py)
    ckpt_writer = (
        ckpt_lib.AsyncCheckpointWriter()
        if bool(train_cfg.get("async_checkpoint", True)) and ckpt_every_steps > 0
        else None
    )
    val_every_steps = int(train_cfg.get("val_every_steps", 500))
    background_sample_prob = float(data_cfg.get("background_sample_prob", 0.0))
    max_steps = train_cfg.get("max_steps")

    log_batch_and_buckets(
        batch_size=int(data_cfg.get("batch_size", 1)),
        grad_accum=step_cfg.gradient_accumulation_steps,
        num_devices=n_devices,
        train_loader=train_loader,
    )
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    print(f"[Params] trainable parameters: {n_params:,}")

    seed = int(train_cfg.get("seed", 0))
    key = jax.random.PRNGKey(seed)
    host_rng = np.random.default_rng(seed)
    input_sharding = batch_sharding(mesh)
    performed_validation = False
    pending: List[Dict[str, Array]] = []
    last_metrics: Dict[str, float] = {}
    images_seen = 0
    t_start = time.time()

    def materialize(step_at: int, epoch: int) -> Dict[str, float]:
        nonlocal pending
        if not pending:
            return dict(last_metrics)
        vals = {k: float(np.asarray(v)) for k, v in pending[-1].items()}
        for name, v in vals.items():
            ensure_finite(v, name, epoch=epoch, step=step_at)
        pending = []
        return vals

    from ragb_vae_tpu.utils.metrics_logger import MetricsLogger
    from ragb_vae_tpu.utils.profiling import annotate, trace_context

    metrics_logger = MetricsLogger(
        # one JSONL writer on shared filesystems; metrics are replicated so
        # process 0's view is the global truth
        train_cfg.get("metrics_dir", train_cfg.get("ckpt_dir"))
        if jax.process_index() == 0
        else None
    )

    # Resume places the run INSIDE the schedule, not at its start: derive
    # the epoch and intra-epoch position from the restored step (otherwise a
    # resumed run re-trains the full epoch count on replayed data), and fold
    # the restored step into the key so the noise stream continues rather
    # than replaying the crashed run's draws.
    start_epoch = 0
    skip_batches = 0
    if start_step > 0:
        key = jax.random.fold_in(key, start_step)
        try:
            steps_per_epoch = len(train_loader)
        except TypeError:
            steps_per_epoch = 0
        if steps_per_epoch > 0:
            start_epoch = min(start_step // steps_per_epoch, max(epochs - 1, 0))
            skip_batches = start_step - start_epoch * steps_per_epoch
            print(
                f"[RGBA-VAE] resume position: epoch {start_epoch}, "
                f"skipping {skip_batches} batches"
            )

    from ragb_vae_tpu.utils.preemption import PreemptionGuard, preemption_enabled

    preempted = False
    try:
      with PreemptionGuard(enabled=preemption_enabled(train_cfg)) as guard, \
          trace_context(
          train_cfg.get("profile_dir", "outputs/trace"),
          enabled=bool(train_cfg.get("profile", False)),
      ):
        for epoch in range(start_epoch, epochs):
            train_loader.set_epoch(epoch)
            for batch in train_loader:
                if epoch == start_epoch and skip_batches > 0:
                    skip_batches -= 1
                    continue
                inputs = build_training_batch(
                    batch,
                    background_sample_prob=background_sample_prob,
                    rng=host_rng,
                )
                micro = step_cfg.gradient_accumulation_steps
                n_real = inputs.shape[0]
                if n_proc > 1 and "global_batch_size" in batch:
                    # multi-host sharded loader: this host decoded only its
                    # slice — pad LOCALLY to the per-host share of the global
                    # pad multiple and assemble the global array without
                    # cross-host transfers (parallel.put_global_batch)
                    inputs = pad_to_multiple(
                        np.asarray(inputs, dtype=np.float32),
                        (n_devices // n_proc) * micro,
                    )
                    images = put_global_batch(inputs, input_sharding)
                    weights = put_global_batch(
                        padding_weights(n_real, inputs.shape[0]), input_sharding
                    )
                    n_step_real = n_real * n_proc  # uniform per-host slices
                else:
                    inputs = pad_to_multiple(
                        np.asarray(inputs, dtype=np.float32), n_devices * micro
                    )
                    # is_global: on multi-host runs with an unsharded loader
                    # every host holds the identical full batch (shared seed)
                    images = put_global_batch(
                        inputs, input_sharding, is_global=True
                    )
                    weights = put_global_batch(
                        padding_weights(n_real, inputs.shape[0]),
                        input_sharding,
                        is_global=True,
                    )
                    n_step_real = n_real
                key, sub = jax.random.split(key)
                with annotate("rgba_vae_train_step", step=global_step):
                    params, opt_state, metrics = train_step(
                        params, opt_state, {"images": images, "weights": weights}, sub
                    )
                global_step += 1
                images_seen += n_step_real
                pending = [metrics]  # only the newest is ever materialized

                if nan_check_every > 0 and global_step % nan_check_every == 0:
                    last_metrics = materialize(global_step, epoch)
                if log_every > 0 and global_step % log_every == 0:
                    last_metrics = materialize(global_step, epoch) or last_metrics
                    metrics_logger.log(last_metrics, step=global_step)
                    loss_value = last_metrics.get("train/loss", float("nan"))
                    ips = images_seen / max(time.time() - t_start, 1e-9)
                    print(
                        f"[RGBA-VAE] epoch {epoch} step {global_step} "
                        f"loss {loss_value:.4f} ({ips:.1f} img/s)",
                        flush=True,
                    )

                if (
                    train_cfg.get("run_validation", True)
                    and val_loader is not None
                    and val_every_steps > 0
                    and global_step % val_every_steps == 0
                ):
                    key, sub = jax.random.split(key)
                    last_metrics.update(
                        evaluate_rgba_vae(
                            model,
                            params,
                            val_loader,
                            epoch=epoch,
                            eval_cfg=train_cfg,
                            global_step=global_step,
                            mesh=mesh,
                            eval_step=eval_step,
                            key=sub,
                        )
                    )
                    performed_validation = True

                if ckpt_every_steps > 0 and global_step % ckpt_every_steps == 0:
                    save_checkpoints(
                        model, params, cfg, step=global_step,
                        opt_state=opt_state, writer=ckpt_writer,
                    )

                if guard.should_stop(sync=True):
                    # Preemption (SIGTERM): leave the loop NOW; the tail
                    # below writes a committed checkpoint at this step and
                    # `resume_from: auto` continues the run from it.
                    preempted = True
                    print(
                        f"[RGBA-VAE] preempted at step {global_step} "
                        f"({guard.describe()}) — checkpointing and exiting",
                        flush=True,
                    )
                    raise StopIteration

                if max_steps is not None and global_step - start_step >= int(max_steps):
                    raise StopIteration
    except StopIteration:
        pass

    last_metrics = materialize(global_step, epochs - 1) or last_metrics

    if (
        train_cfg.get("run_validation", True)
        and val_loader is not None
        and not performed_validation
        and not preempted  # grace window goes to the checkpoint, not eval
    ):
        key, sub = jax.random.split(key)
        last_metrics.update(
            evaluate_rgba_vae(
                model,
                params,
                val_loader,
                epoch=epochs - 1,
                eval_cfg=train_cfg,
                global_step=global_step,
                mesh=mesh,
                eval_step=eval_step,
                key=sub,
            )
        )

    if ckpt_writer is not None:
        ckpt_writer.wait()  # drain any in-flight periodic save first
    save_checkpoints(model, params, cfg, step=global_step, opt_state=opt_state)
    last_metrics["global_step"] = float(global_step)
    if preempted:
        last_metrics["preempted"] = 1.0
    return last_metrics

"""Checkpoint save/load for training state.

The reference saves weights only — `rgba_vae.pt` + HF dir, no optimizer
state, so "resume" is re-init from weights (SURVEY.md §5.4). We keep the
HF-format export bit-compatible (torch-key safetensors readable by
diffusers) and ADD true resume: optimizer state + step are serialized via
flax msgpack, fixing the reference's missing-resume gap.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Tuple, Union

import jax
from flax import serialization

from ragb_vae_tpu.models.vae_config import AutoencoderConfig
from ragb_vae_tpu.models.weights import save_autoencoder_params

PyTree = Any

STATE_FILE = "train_state.msgpack"
META_FILE = "train_state.json"
HF_SUBDIR = "rgba_vae_hf"


def checkpoint_dir(base: Union[str, Path], step: Optional[int] = None) -> Path:
    """`ckpt_dir/step_{NNNNNNN}` naming parity (rgba_vae_stage.py:886)."""
    base = Path(base)
    return base if step is None else base / f"step_{step:07d}"


def save_train_checkpoint(
    directory: Union[str, Path],
    *,
    config: AutoencoderConfig,
    params: PyTree,
    opt_state: Optional[PyTree] = None,
    step: int = 0,
    extra_meta: Optional[dict] = None,
) -> Path:
    """Write HF-format weights (+ optional resume state) under `directory`."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    host_params = jax.device_get(params)
    save_autoencoder_params(config, host_params, directory / HF_SUBDIR)
    meta = {"step": int(step)}
    if extra_meta:
        meta.update(extra_meta)
    if opt_state is not None:
        host_opt = jax.device_get(opt_state)
        (directory / STATE_FILE).write_bytes(serialization.to_bytes(host_opt))
    (directory / META_FILE).write_text(json.dumps(meta, indent=2))
    return directory


def load_train_checkpoint(
    directory: Union[str, Path],
    *,
    opt_state_template: Optional[PyTree] = None,
) -> Tuple[AutoencoderConfig, PyTree, Optional[PyTree], dict]:
    """Returns (config, params, opt_state-or-None, meta)."""
    from ragb_vae_tpu.models.weights import load_autoencoder_params

    directory = Path(directory)
    config, params = load_autoencoder_params(directory / HF_SUBDIR)
    meta = {}
    meta_path = directory / META_FILE
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
    opt_state = None
    state_path = directory / STATE_FILE
    if state_path.exists() and opt_state_template is not None:
        opt_state = serialization.from_bytes(opt_state_template, state_path.read_bytes())
    return config, params, opt_state, meta


def _step_number(path: Path) -> int:
    """Numeric step from a step_* dir name (lexical sort mis-orders once
    the step outgrows the zero-pad width)."""
    try:
        return int(path.name.split("_", 1)[1])
    except (IndexError, ValueError):
        return -1


def is_complete_checkpoint(path: Path) -> bool:
    """META_FILE is written LAST by save_train_checkpoint, so its presence
    marks a committed checkpoint; a dir without it is a partial write
    (crash mid-save) and must not be auto-resumed from."""
    return (path / META_FILE).exists()


def latest_checkpoint(base: Union[str, Path]) -> Optional[Path]:
    """Most recent COMPLETE `step_*` dir under `base` (for auto-resume)."""
    base = Path(base)
    if not base.exists():
        return None
    candidates = sorted(
        (
            p for p in base.iterdir()
            if p.is_dir() and p.name.startswith("step_") and is_complete_checkpoint(p)
        ),
        key=_step_number,
    )
    return candidates[-1] if candidates else None


def prune_checkpoints(base: Union[str, Path], keep_last: int) -> int:
    """Keep only the newest `keep_last` step_* dirs; returns removed count.

    Production-run disk hygiene the reference lacks (it accumulates every
    step_* dir forever).
    """
    import shutil

    base = Path(base)
    if keep_last <= 0 or not base.exists():
        return 0
    # numeric order; partial (meta-less) dirs sort oldest so they are the
    # first pruned and never displace a complete checkpoint from the keep set
    candidates = sorted(
        (p for p in base.iterdir() if p.is_dir() and p.name.startswith("step_")),
        key=lambda p: (is_complete_checkpoint(p), _step_number(p)),
    )
    removed = 0
    for stale in candidates[:-keep_last] if keep_last < len(candidates) else []:
        shutil.rmtree(stale)
        removed += 1
    return removed


class AsyncCheckpointWriter:
    """Background-thread checkpoint writer: serialization + file IO happen
    on a worker thread while the training loop keeps stepping (orbax
    AsyncCheckpointer's overlap, kept on OUR on-disk layout — the
    HF-format dir the reference's tooling and `from_pretrained` consumers
    require; orbax's own format would break that contract).

    The device->host snapshot happens SYNCHRONOUSLY in `submit`: the
    training step donates its params/opt_state buffers, so a worker-side
    `device_get` would race buffer reuse and read deleted arrays (observed
    as a failed save on the donated step path). One save in flight at a
    time: a new submit waits for the previous write (bounded memory — at
    most one host copy queued). Always `wait()` (or use as a context
    manager) before reading the checkpoint or exiting; worker errors
    surface at the next submit/wait."""

    def __init__(self) -> None:
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt")
        self._pending = None

    def submit(self, directory: Union[str, Path], *, on_complete=None, **save_kwargs) -> None:
        """Queue `save_train_checkpoint(directory, **save_kwargs)`.

        `on_complete` (optional, no-arg) runs on the worker thread strictly
        AFTER the save lands — retention pruning belongs here, not on the
        submitting thread, where it would race the in-flight write and could
        delete the last complete checkpoint while the new one is partial.
        """
        self.wait()
        # snapshot device arrays to host NOW (donation safety); the worker
        # then only serializes and writes
        for key in ("params", "opt_state"):
            if save_kwargs.get(key) is not None:
                save_kwargs[key] = jax.device_get(save_kwargs[key])

        def _save_then_complete():
            result = save_train_checkpoint(directory, **save_kwargs)
            if on_complete is not None:
                on_complete()
            return result

        self._pending = self._pool.submit(_save_then_complete)

    def wait(self) -> None:
        """Block until the in-flight save (if any) lands; re-raise errors."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def __enter__(self) -> "AsyncCheckpointWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.wait()
        self._pool.shutdown(wait=True)

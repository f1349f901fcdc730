"""Graceful preemption: SIGTERM -> checkpoint -> clean exit -> resume.

Beyond-parity: the torch reference has no preemption handling — SIGTERM
kills it mid-step (/root/reference/src/training/rgba_vae_stage.py has no
signal handling); on preemptible TPU capacity that loses up to
ckpt_every_steps of work. Here both training stages poll a
PreemptionGuard each step and exit through the committed-checkpoint
path, so `resume_from: auto` continues the run.

Three layers:
  1. unit: the guard's signal plumbing (real SIGTERM via raise_signal)
  2. in-process stage tests (deterministic trigger via request_stop on a
     step boundary) — checkpoint written, resume continues
  3. subprocess: real SIGTERM delivered to a live `scripts/train.py`
"""
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import yaml

from ragb_vae_tpu.utils.preemption import PreemptionGuard, preemption_enabled

# reuse the tiny-model fixtures/config builders from the stage tests
from tests.test_training_stage import (  # noqa: F401  (fixtures)
    _make_cfg,
    data_tree,
    tiny_ckpt,
)
from tests.test_lora_stage import (  # noqa: F401  (fixtures)
    _cfg as _lora_cfg,
    data_root,
    pretrained_dir,
)


# ---------------------------------------------------------------- unit

def test_guard_sigterm_roundtrip():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.stop_requested
        signal.raise_signal(signal.SIGTERM)
        assert guard.stop_requested
        assert guard.should_stop()  # single-process: no collective
        assert "SIGTERM" in guard.describe()
    # handler restored on exit
    assert signal.getsignal(signal.SIGTERM) is prev


def test_guard_disabled_installs_nothing():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard(enabled=False) as guard:
        assert signal.getsignal(signal.SIGTERM) is prev
        assert not guard.should_stop()
        guard.request_stop()  # programmatic path still works
        assert guard.should_stop()


def test_preemption_enabled_gates(monkeypatch):
    assert preemption_enabled({})
    assert not preemption_enabled({"handle_preemption": False})
    monkeypatch.setenv("RAGB_NO_PREEMPTION", "1")
    assert not preemption_enabled({})


def _stop_after(monkeypatch, n: int):
    """Patch PreemptionGuard.should_stop to fire on the n-th step poll.

    The stages poll exactly once per optimizer step, so this is a
    deterministic stand-in for a SIGTERM landing during step n.
    """
    calls = {"n": 0}

    def fake_should_stop(self, sync: bool = False):
        calls["n"] += 1
        if calls["n"] >= n:
            self.request_stop()
        return self.stop_requested

    monkeypatch.setattr(PreemptionGuard, "should_stop", fake_should_stop)
    return calls


# ------------------------------------------------- in-process: VAE stage

def test_vae_stage_preemption_checkpoints_then_resumes(
    tiny_ckpt, data_tree, tmp_path, monkeypatch  # noqa: F811
):
    from ragb_vae_tpu.training.rgba_vae_stage import train_rgba_vae

    _stop_after(monkeypatch, 2)
    cfg = _make_cfg(tiny_ckpt, data_tree, tmp_path, max_steps=10, run_validation=False)
    metrics = train_rgba_vae(cfg)
    assert metrics["preempted"] == 1.0
    assert metrics["global_step"] == 2.0

    ckpt = tmp_path / "ckpts" / "step_0000002"
    assert (ckpt / "train_state.msgpack").exists()
    assert json.loads((ckpt / "train_state.json").read_text())["step"] == 2

    # resume from the preemption checkpoint and run 1 more step
    monkeypatch.undo()
    resume_cfg = _make_cfg(
        tiny_ckpt, data_tree, tmp_path, max_steps=1, run_validation=False,
        resume_from=str(ckpt),
    )
    metrics2 = train_rgba_vae(resume_cfg)
    assert "preempted" not in metrics2
    assert metrics2["global_step"] == 3.0
    assert (tmp_path / "ckpts" / "step_0000003" / "train_state.msgpack").exists()


# ------------------------------------------------ in-process: LoRA stage

def test_lora_stage_preemption_checkpoints_then_resumes(
    pretrained_dir, data_root, tmp_path, monkeypatch  # noqa: F811
):
    from ragb_vae_tpu.training.flux_kontext_textalpha_lora import train_from_config

    _stop_after(monkeypatch, 2)
    cfg = _lora_cfg(pretrained_dir, data_root, tmp_path, max_train_steps=10)
    metrics = train_from_config(cfg)
    assert metrics["preempted"] == 1.0
    assert metrics["global_step"] == 2.0

    ckpt = tmp_path / "ckpts" / "checkpoint-2"
    assert (ckpt / "pytorch_lora_weights.safetensors").exists()
    assert (ckpt / "train_state.msgpack").exists()
    assert not (tmp_path / "ckpts" / "final").exists()  # no bogus "final"

    # `resume_from: auto` picks the preemption checkpoint
    monkeypatch.undo()
    cfg2 = _lora_cfg(
        pretrained_dir, data_root, tmp_path, max_train_steps=3, resume_from="auto"
    )
    metrics2 = train_from_config(cfg2)
    assert "preempted" not in metrics2
    assert metrics2["global_step"] == 3.0
    meta = json.loads((tmp_path / "ckpts" / "final" / "metadata.json").read_text())
    assert meta["step"] == 3


# --------------------------------------------- subprocess: real SIGTERM

def test_train_cli_sigterm_checkpoints_and_exits(tiny_ckpt, data_tree, tmp_path):  # noqa: F811
    """A real SIGTERM to a live `scripts/train.py` lands a checkpoint."""
    # epochs high enough that the run cannot finish before the signal lands
    cfg = _make_cfg(
        tiny_ckpt, data_tree, tmp_path,
        max_steps=500, epochs=200, run_validation=False,
    )
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single CPU device keeps the subprocess light
    repo = Path(__file__).resolve().parent.parent
    proc = subprocess.Popen(
        [sys.executable, str(repo / "scripts" / "train.py"), "--config", str(cfg_path)],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
        cwd=repo,
    )
    try:
        # wait for the first optimizer step to log, then preempt
        deadline = time.time() + 900
        saw_step = False
        lines = []
        for line in proc.stdout:
            lines.append(line)
            if "step 1 " in line or "step 1\n" in line or "loss" in line:
                saw_step = True
                break
            if time.time() > deadline:
                break
        assert saw_step, "never saw a training step log:\n" + "".join(lines[-50:])
        proc.send_signal(signal.SIGTERM)
        out = proc.stdout.read()
        rc = proc.wait(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0, f"train.py exited {rc}:\n{out[-3000:]}"
    assert "preempted at step" in out
    ckpts = sorted((tmp_path / "ckpts").glob("step_*"))
    assert ckpts, "no checkpoint written on preemption"
    meta = json.loads((ckpts[-1] / "train_state.json").read_text())
    assert meta["step"] >= 1

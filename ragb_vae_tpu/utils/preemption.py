"""Graceful preemption: SIGTERM -> checkpoint -> clean exit.

TPU pods are preemptible (spot capacity, maintenance events); GCE
delivers SIGTERM to every worker VM with a short grace window. The
training loops poll :class:`PreemptionGuard` once per step and, when a
signal has landed, save a committed checkpoint and return instead of
dying mid-step — so `resume_from: auto` continues the run exactly where
it stopped.

Beyond-parity: the torch reference has no preemption handling at all —
a SIGTERM there kills the process wherever it happens to be, losing up
to `ckpt_every_steps` of work and (with the reference's synchronous
writer) possibly corrupting an in-flight save. Related design:
checkpoint commit markers in training/checkpoint.py make the save
atomic; this module decides *when* to trigger the final one.

Multi-host note: preemption signals every worker on the pod, so a
per-host flag is normally consistent. For defense against asymmetric
delivery (one host signaled early), `should_stop(sync=...)` can OR the
flag across processes with a tiny psum so every host leaves the loop at
the same step — required, or hosts deadlock in the next collective.
"""
from __future__ import annotations

import os
import signal
import threading
from typing import Optional

import jax
import numpy as np

_DEFAULT_SIGNALS = (signal.SIGTERM,)


class PreemptionGuard:
    """Installs signal handlers; exposes a per-step stop poll.

    Use as a context manager so the previous handlers are restored on
    exit (training stages run in-process in tests and notebooks — a
    leaked handler would outlive the run).

    Handlers can only be installed from the main thread; elsewhere the
    guard degrades to an inert poll (``should_stop()`` is then always
    False unless :meth:`request_stop` is called programmatically).
    """

    def __init__(self, signals=_DEFAULT_SIGNALS, enabled: bool = True):
        self._signals = tuple(signals)
        self._enabled = bool(enabled) and bool(self._signals)
        self._event = threading.Event()
        self._prev: dict = {}
        self._installed = False
        self._received: Optional[int] = None

    # -- lifecycle ---------------------------------------------------------
    def __enter__(self) -> "PreemptionGuard":
        if self._enabled and threading.current_thread() is threading.main_thread():
            for sig in self._signals:
                self._prev[sig] = signal.signal(sig, self._on_signal)
            self._installed = True
        return self

    def __exit__(self, *exc) -> None:
        if self._installed:
            for sig, prev in self._prev.items():
                signal.signal(sig, prev)
            self._installed = False
        return None

    # -- signal path -------------------------------------------------------
    def _on_signal(self, signum, frame) -> None:
        # async-signal context: only set state, never checkpoint here
        self._received = signum
        self._event.set()

    def request_stop(self) -> None:
        """Programmatic preemption (tests; external orchestrators)."""
        self._event.set()

    # -- polling -----------------------------------------------------------
    @property
    def stop_requested(self) -> bool:
        """Local flag only — no collective, safe anywhere."""
        return self._event.is_set()

    def should_stop(self, sync: bool = False) -> bool:
        """Poll the flag; with ``sync=True`` OR it across processes.

        Sync costs one scalar psum and is only needed on multi-process
        runs where hosts might be signaled asymmetrically; single-process
        (the common case, incl. the tunneled chip) short-circuits.
        """
        local = self._event.is_set()
        if not sync or jax.process_count() == 1:
            return local
        from jax.experimental import multihost_utils

        flag = multihost_utils.process_allgather(np.asarray(local, np.int32))
        agreed = bool(np.any(flag))
        if agreed:
            self._event.set()  # make later local polls consistent
        return agreed

    def describe(self) -> str:
        if self._received is not None:
            try:
                name = signal.Signals(self._received).name
            except ValueError:
                name = str(self._received)
            return f"signal {name}"
        return "stop requested"


def preemption_enabled(train_cfg) -> bool:
    """Config/env gate: `training.handle_preemption` (default ON).

    RAGB_NO_PREEMPTION=1 force-disables (e.g. when an outer harness owns
    SIGTERM).
    """
    if os.environ.get("RAGB_NO_PREEMPTION") == "1":
        return False
    get = getattr(train_cfg, "get", None)
    if get is None:
        return True
    return bool(get("handle_preemption", True))

"""Tracing / profiling hooks (SURVEY.md §5.1 — absent in the reference,
whose only instrumentation is tqdm; here: jax.profiler traces viewable in
Perfetto/TensorBoard, opt-in via config or env).

Usage:
    with trace_context("outputs/trace", enabled=cfg.get("profile")):
        for step ...:
            with annotate("train_step", step=step):
                train_step(...)

`RAGB_PROFILE_DIR` env var force-enables tracing to that directory.
"""
from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


def maybe_start_server(port: Optional[int] = None) -> bool:
    """Start the jax.profiler gRPC server (live capture) if a port is given
    or RAGB_PROFILE_PORT is set. Returns whether it started."""
    import jax

    port = port or (int(os.environ["RAGB_PROFILE_PORT"]) if os.environ.get("RAGB_PROFILE_PORT") else None)
    if port is None:
        return False
    jax.profiler.start_server(port)
    return True


@contextlib.contextmanager
def trace_context(log_dir: Optional[str], *, enabled: bool = True) -> Iterator[None]:
    """Whole-run trace written as a Perfetto/TensorBoard-readable dump."""
    import jax

    env_dir = os.environ.get("RAGB_PROFILE_DIR")
    target = env_dir or (log_dir if enabled else None)
    if not target:
        yield
        return
    jax.profiler.start_trace(target)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str, **kwargs) -> Iterator[None]:
    """Named region in the device trace (TraceAnnotation / StepTraceAnnotation)."""
    import jax

    if "step" in kwargs:
        with jax.profiler.StepTraceAnnotation(name, step_num=kwargs["step"]):
            yield
    else:
        with jax.profiler.TraceAnnotation(name):
            yield

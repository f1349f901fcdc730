"""Cross-cutting utilities: profiling/trace annotations, rank-0 logging."""
from ragb_vae_tpu.utils.profiling import (
    annotate,
    maybe_start_server,
    trace_context,
)

__all__ = ["annotate", "maybe_start_server", "trace_context"]

"""Step-metric sink: JSONL on disk (SURVEY.md §5.5 — the reference's
`accelerator.log` goes to a tracker hook with no tracker configured, i.e.
a no-op; here metrics land in `<dir>/metrics.jsonl`, one JSON object per
logging step, trivially loadable with pandas/jq)."""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional, Union


class MetricsLogger:
    def __init__(self, log_dir: Optional[Union[str, Path]], *, filename: str = "metrics.jsonl"):
        self._path: Optional[Path] = None
        if log_dir:
            directory = Path(log_dir)
            directory.mkdir(parents=True, exist_ok=True)
            self._path = directory / filename
        self._t0 = time.time()

    def log(self, metrics: Dict[str, Any], *, step: int) -> None:
        if self._path is None:
            return
        record = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        for key, value in metrics.items():
            try:
                record[key] = float(value)
            except (TypeError, ValueError):
                record[key] = value
        with self._path.open("a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")

    @property
    def path(self) -> Optional[Path]:
        return self._path

"""Structured metrics/observability logging (SURVEY.md §5).

The reference observes through imshow windows and a mouse-click pixel
printer (``/root/reference/src/functions.cpp:220-239``). Here metrics are
JSON-lines events (machine-readable, append-only) and image artifacts go to
PNG via ``datasets.io.save_png`` instead of blocking GUI windows.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    """Append-only JSONL metrics log with wall-clock stamps.

    >>> log = MetricsLogger("/tmp/run/metrics.jsonl")  # doctest: +SKIP
    >>> log.log("two_view", bad2=0.021, mps=3.4)  # doctest: +SKIP
    """

    def __init__(self, path: Optional[str] = None, echo: bool = False) -> None:
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, event: str, **metrics: Any) -> Dict[str, Any]:
        record = {"ts": time.time(), "event": event}
        for k, v in metrics.items():
            record[k] = float(v) if hasattr(v, "__float__") else v
        line = json.dumps(record, sort_keys=True)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self.echo:
            print(line, file=sys.stderr)
        return record


def read_metrics(path: str):
    """Load a JSONL metrics file back as a list of dicts."""
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]

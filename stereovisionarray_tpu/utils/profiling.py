"""Profiling / tracing harness (SURVEY.md §5: the reference has no timing
code at all — no chrono, no clocks; its performance story is "wait and
see"). Three tools:

 - :func:`time_fn` — steady-state timing of a jitted callable with
   ``block_until_ready`` fencing (feeds the MP/s metrics in bench.py);
 - :class:`StageTimer` — named-stage wall-clock accumulator for pipeline
   breakdowns;
 - :func:`trace` — context manager around ``jax.profiler`` emitting a
   TensorBoard-loadable device trace for roofline inspection of the Pallas
   kernels.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs) -> float:
    """Mean steady-state seconds per call (device-fenced)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


class StageTimer:
    """Accumulates wall-clock per named stage.

    >>> t = StageTimer()
    >>> with t.stage("cost"):
    ...     vol = build(...)  # doctest: +SKIP
    >>> t.report()  # doctest: +SKIP
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync: bool = True):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                # fence pending device work so the stage owns its time
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, float]:
        return dict(self.totals)

    def __str__(self) -> str:
        return " | ".join(
            f"{k}: {v * 1000:.1f}ms/{self.counts[k]}" for k, v in self.totals.items()
        )


@contextlib.contextmanager
def trace(log_dir: str):
    """Device trace context: ``with trace('/tmp/trace'): run()`` then load
    the directory in TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

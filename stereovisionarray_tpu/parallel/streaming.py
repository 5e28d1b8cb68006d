"""Streaming execution: input-pipeline overlap + stage pipelining (P4).

The reference processes one frame set, synchronously, end to end
(``/root/reference/src/CameraStereoVision.cpp:10-123``). For production
throughput the engine must keep the chips busy while the host decodes and
transfers — and, on multi-device slices, keep *every stage's* devices busy by
software-pipelining frames across stages.

Two building blocks:

:class:`StreamExecutor`
    Host→device input pipeline: device_put frames ahead of consumption
    (bounded look-ahead) and rely on JAX's async dispatch so decode (C++
    prefetch loader), H2D copy, and device compute overlap. Results are
    yielded in order; only the *consumer* ever blocks.

:class:`DevicePipeline`
    Multi-stage pipeline over disjoint device groups (the P4 axis of
    SURVEY.md §2.2): stage i's jitted fn runs on its own devices; frames
    flow through with explicit `device_put` hops. Because dispatch is
    async, frame t+1 occupies stage 0 while frame t occupies stage 1 —
    the classic 1F1B-style overlap without any scheduler thread; the
    dependency graph (per-frame chain, per-stage device serialization)
    IS the schedule, and XLA's per-device execution streams realize it.
"""

from __future__ import annotations

import collections
import time
from typing import Any, Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

import jax

__all__ = ["StreamExecutor", "DevicePipeline", "throughput_stream"]


class StreamExecutor:
    """Run a jitted per-frame fn over a host frame stream with bounded
    look-ahead.

    Args:
      step_fn: jitted callable taking one device array (or pytree).
      depth: frames kept in flight (decoded + transferred + dispatched)
        beyond the one being consumed. 2 is enough to hide H2D + dispatch.
      device_put: placement for incoming frames (a Device or Sharding);
        None uses the default device.
    """

    def __init__(self, step_fn: Callable, depth: int = 2, device_put: Any = None):
        self.step_fn = step_fn
        self.depth = max(1, depth)
        self.placement = device_put

    def run(self, frames: Iterable[Any]) -> Iterator[Any]:
        """Yield step_fn(frame) per frame, in order, with overlap."""
        inflight: collections.deque = collections.deque()
        it = iter(frames)
        exhausted = False
        while not exhausted or inflight:
            while not exhausted and len(inflight) < self.depth:
                try:
                    host_frame = next(it)
                except StopIteration:
                    exhausted = True
                    break
                dev_frame = (
                    jax.device_put(host_frame, self.placement)
                    if self.placement is not None
                    else jax.device_put(host_frame)
                )
                # async dispatch: returns immediately, compute queued
                inflight.append(self.step_fn(dev_frame))
            if inflight:
                yield inflight.popleft()


class DevicePipeline:
    """Software pipeline of jitted stages over disjoint device groups.

    stages: sequence of (fn, placement) where placement is a Device or
    Sharding for that stage's *input*; fn must be jittable (it is wrapped in
    jax.jit pinned to the placement's devices via device_put of inputs).

    `run` streams frames through all stages and yields final outputs in
    order. In steady state, S stages hold S consecutive frames — pipeline
    parallelism across the mesh without a scheduler: correctness comes from
    data dependencies, overlap from JAX async dispatch + per-device streams.
    """

    def __init__(self, stages: Sequence[Tuple[Callable, Any]]):
        if not stages:
            raise ValueError("need at least one stage")
        self.stages = list(stages)

    def run(self, frames: Iterable[Any], depth: Optional[int] = None) -> Iterator[Any]:
        n_stages = len(self.stages)
        depth = depth if depth is not None else n_stages + 1
        inflight: collections.deque = collections.deque()
        it = iter(frames)
        exhausted = False
        while not exhausted or inflight:
            while not exhausted and len(inflight) < depth:
                try:
                    x = next(it)
                except StopIteration:
                    exhausted = True
                    break
                for fn, placement in self.stages:
                    x = jax.device_put(x, placement) if placement is not None else x
                    x = fn(x)
                inflight.append(x)
            if inflight:
                yield inflight.popleft()


def throughput_stream(
    step_fn: Callable,
    frames: Iterable[Any],
    depth: int = 2,
    device_put: Any = None,
) -> Tuple[List[Any], float]:
    """Run a stream to completion and measure end-to-end frames/s (the
    BASELINE.json frames/s metric): returns (outputs, frames_per_second).
    Blocks on every output (so the number is honest, not dispatch-only)."""
    ex = StreamExecutor(step_fn, depth=depth, device_put=device_put)
    outputs = []
    t0 = time.perf_counter()
    for out in ex.run(frames):
        outputs.append(jax.block_until_ready(out))
    dt = time.perf_counter() - t0
    fps = len(outputs) / dt if dt > 0 else float("inf")
    return outputs, fps

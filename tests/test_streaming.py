"""Streaming / pipeline-parallel execution (parallel/streaming.py, P4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereovisionarray_tpu.parallel import (
    DevicePipeline,
    StreamExecutor,
    throughput_stream,
)


def test_stream_executor_order_and_values():
    step = jax.jit(lambda x: x * 2.0 + 1.0)
    frames = [np.full((8, 8), float(i), dtype=np.float32) for i in range(12)]
    outs = list(StreamExecutor(step, depth=3).run(frames))
    assert len(outs) == 12
    for i, o in enumerate(outs):
        np.testing.assert_allclose(np.asarray(o), 2.0 * i + 1.0)


def test_stream_executor_bounded_lookahead():
    """The executor must never pull more than `depth` frames ahead of the
    consumer (bounded host memory)."""
    pulled = []

    def gen():
        for i in range(10):
            pulled.append(i)
            yield np.full((4,), float(i), dtype=np.float32)

    step = jax.jit(lambda x: x + 1)
    it = StreamExecutor(step, depth=2).run(gen())
    next(it)  # consume frame 0
    # after one consumption the executor holds at most depth in flight:
    # pulls <= consumed(1) + depth(2)
    assert len(pulled) <= 3


def test_device_pipeline_two_stages_distinct_devices():
    devs = jax.devices()
    assert len(devs) >= 2
    s1 = jax.jit(lambda x: x + 10.0)
    s2 = jax.jit(lambda x: x * 3.0)
    pipe = DevicePipeline([(s1, devs[0]), (s2, devs[1])])
    frames = [np.full((16,), float(i), dtype=np.float32) for i in range(8)]
    outs = [np.asarray(o) for o in pipe.run(frames)]
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o, (i + 10.0) * 3.0)
    # final output lives on the last stage's device
    last = pipe.run([frames[0]])
    (res,) = list(last)
    assert list(res.devices())[0] == devs[1]


def test_device_pipeline_realistic_stages():
    """Cost-build on one device, aggregation on another — a minimal stereo
    stage split."""
    devs = jax.devices()
    from stereovisionarray_tpu.ops import fused_cost_volume, winner_take_all

    def build(pair):
        left, right = pair
        return fused_cost_volume(left, right, 16)

    def extract(vol):
        d, _ = winner_take_all(vol)
        return d

    s1 = jax.jit(build)
    s2 = jax.jit(extract)
    pipe = DevicePipeline([(s1, devs[0]), (s2, devs[1 % len(devs)])])

    rng = np.random.default_rng(0)
    frames = []
    for _ in range(3):
        base = rng.uniform(0, 255, size=(32, 48 + 4)).astype(np.float32)
        frames.append((base[:, :48], base[:, 4:]))
    outs = [np.asarray(o) for o in pipe.run(frames)]
    assert all(o.shape == (32, 48) for o in outs)
    assert all(np.isfinite(o).all() for o in outs)


def test_throughput_stream_reports_fps():
    step = jax.jit(lambda x: jnp.sum(x * x))
    frames = [np.ones((64, 64), dtype=np.float32)] * 5
    outs, fps = throughput_stream(step, frames, depth=2)
    assert len(outs) == 5 and fps > 0

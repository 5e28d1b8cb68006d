"""Tests for checkpoint/resume, profiling, and metrics logging."""

import os

import jax.numpy as jnp
import numpy as np

from stereovisionarray_tpu.config import EngineConfig
from stereovisionarray_tpu.utils import (
    MetricsLogger,
    StageTimer,
    load_checkpoint,
    save_checkpoint,
    time_fn,
)
from stereovisionarray_tpu.utils.obslog import read_metrics


class TestCheckpoint:
    def test_roundtrip_state_and_config(self, tmp_path):
        state = {
            "depth": jnp.arange(12.0).reshape(3, 4),
            "poses": {"R": jnp.eye(3), "t": jnp.zeros(3)},
            "step": jnp.asarray(7),
        }
        cfg = EngineConfig().override(**{"sgm.p1": 11.0})
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state, cfg)
        restored, cfg2 = load_checkpoint(path)
        np.testing.assert_allclose(np.asarray(restored["depth"]), np.asarray(state["depth"]))
        np.testing.assert_allclose(np.asarray(restored["poses"]["R"]), np.eye(3))
        assert int(restored["step"]) == 7
        assert cfg2.sgm.p1 == 11.0

    def test_resume_after_partial_work(self, tmp_path):
        """The resume pattern: save at step k, restore, continue."""
        path = str(tmp_path / "ckpt2")
        save_checkpoint(path, {"acc": jnp.asarray(3.0), "it": jnp.asarray(5)})
        state, _ = load_checkpoint(path)
        acc = jnp.asarray(state["acc"]) + 1.0
        assert float(acc) == 4.0 and int(state["it"]) == 5


class TestProfiling:
    def test_time_fn_positive(self):
        import jax

        f = jax.jit(lambda x: x * 2 + 1)
        x = jnp.ones((64, 64))
        dt = time_fn(f, x, iters=3, warmup=1)
        assert dt > 0

    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("a"):
            _ = jnp.sum(jnp.ones((32, 32)))
        with t.stage("a"):
            pass
        with t.stage("b"):
            pass
        rep = t.report()
        assert set(rep) == {"a", "b"}
        assert t.counts["a"] == 2
        assert "a:" in str(t)


class TestMetricsLogger:
    def test_jsonl_roundtrip(self, tmp_path):
        p = str(tmp_path / "m.jsonl")
        log = MetricsLogger(p)
        log.log("two_view", bad2=jnp.asarray(0.02), mps=3.5, note="x")
        log.log("calib", ate=0.001)
        rows = read_metrics(p)
        assert len(rows) == 2
        assert rows[0]["event"] == "two_view"
        assert abs(rows[0]["bad2"] - 0.02) < 1e-6
        assert rows[1]["ate"] == 0.001
        assert "ts" in rows[0]

"""Elastic execution / fault tolerance (utils/elastic.py): heartbeat
failure detection, checkpoint-resume with re-sharding onto a SMALLER mesh
(the shrunk-slice recovery of SURVEY.md §5), and kill-one-worker fault
injection."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from stereovisionarray_tpu.parallel import make_mesh
from stereovisionarray_tpu.utils import ElasticRunner, Heartbeat, reshard


class TestHeartbeat:
    def test_detects_dead_worker_and_callback(self):
        dead = []
        hb = Heartbeat(timeout=0.2, on_dead=lambda w, age: dead.append(w),
                       poll_interval=0.05)
        with hb:
            hb.beat("w0")
            hb.beat("w1")
            t0 = time.monotonic()
            while time.monotonic() - t0 < 1.0:
                hb.beat("w0")  # w0 stays alive; w1 goes silent
                time.sleep(0.05)
                if dead:
                    break
        assert dead == ["w1"]
        assert "w1" in hb.dead_workers() and "w0" not in hb.dead_workers()

    def test_recovered_worker_clears(self):
        hb = Heartbeat(timeout=0.1, poll_interval=0.02)
        hb.beat("w")
        time.sleep(0.25)
        assert "w" in hb.dead_workers()
        hb.beat("w")
        assert "w" not in hb.dead_workers()


class TestReshard:
    def test_pytree_onto_smaller_mesh(self):
        big = make_mesh(2, 2, 2)
        small = make_mesh(2, 2, 1, devices=jax.devices()[:4])
        x = jnp.arange(32, dtype=jnp.float32).reshape(8, 4)
        y = jnp.ones((4, 4, 4))
        state = {"x": jax.device_put(x, NamedSharding(big, P("data", None))),
                 "y": jax.device_put(y, NamedSharding(big, P("data", "tile", "disp")))}
        out = reshard(state, small,
                      {"x": P("data", None), "y": P("data", "tile", None)})
        np.testing.assert_array_equal(np.asarray(out["x"]), np.asarray(x))
        np.testing.assert_array_equal(np.asarray(out["y"]), np.asarray(y))
        assert set(out["x"].sharding.device_set) <= set(small.devices.flatten())

    def test_single_spec_broadcasts(self):
        mesh = make_mesh(1, 1, 1, devices=jax.devices()[:1])
        out = reshard({"a": jnp.ones(3), "b": jnp.zeros((2, 2))}, mesh)
        assert np.asarray(out["a"]).sum() == 3


class TestElasticRunner:
    def test_fault_injection_resume_smaller_mesh(self, tmp_path):
        """A sharded iterative computation killed mid-run resumes from the
        last checkpoint on HALF the devices and reaches the same result."""
        big = make_mesh(2, 2, 2)
        small = make_mesh(2, 1, 1, devices=jax.devices()[:2])

        spec = P("data", None)

        @jax.jit
        def substep(x):
            return x + jnp.sin(x) * 0.1

        # ground truth: uninterrupted 6 steps
        x0 = jnp.linspace(0.0, 4.0, 32, dtype=jnp.float32).reshape(8, 4)
        want = np.asarray(x0)
        for _ in range(6):
            want = np.asarray(substep(jnp.asarray(want)))

        calls = {"n": 0}
        current_mesh = {"m": big}

        def step(state, i):
            calls["n"] += 1
            if calls["n"] == 4:  # fault injection: die inside step 4
                current_mesh["m"] = small  # "half the slice survived"
                raise RuntimeError("injected device loss")
            return substep(state)

        def placement(state):
            return reshard(state, current_mesh["m"], spec)

        runner = ElasticRunner(step, str(tmp_path / "ckpt"), checkpoint_every=2,
                               placement_fn=placement, max_restarts=2)
        x0_sharded = jax.device_put(x0, NamedSharding(big, spec))
        out = runner.run(x0_sharded, num_steps=6)
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)
        assert runner.restarts == 1
        # resumed work really ran on the small mesh
        assert set(out.sharding.device_set) <= set(small.devices.flatten())

    def test_restart_budget_exhausted_reraises(self, tmp_path):
        def step(state, i):
            raise RuntimeError("always dies")

        runner = ElasticRunner(step, str(tmp_path / "ckpt"), max_restarts=2)
        with pytest.raises(RuntimeError, match="always dies"):
            runner.run(jnp.zeros(4), num_steps=3)
        assert runner.restarts == 3

    def test_checkpoint_cadence_limits_lost_work(self, tmp_path):
        """With checkpoint_every=3, a crash at step 5 resumes from step 3,
        not step 0 (bounded recomputation)."""
        executed = []
        crashed = {"done": False}

        def step(state, i):
            if i == 4 and not crashed["done"]:
                crashed["done"] = True
                raise RuntimeError("boom")
            executed.append(i)
            return state + 1

        runner = ElasticRunner(step, str(tmp_path / "ckpt"), checkpoint_every=3)
        out = runner.run(jnp.asarray(0.0), num_steps=6)
        assert float(out) == 6.0
        # steps 3,4 rerun after the crash; steps 0-2 never rerun
        assert executed == [0, 1, 2, 3, 3, 4, 5]

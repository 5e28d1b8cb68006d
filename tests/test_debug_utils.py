"""Numeric-safety + determinism harness (utils/debug.py) and the `inspect`
CLI subcommand (C13 parity: pixel probing without GUI windows)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereovisionarray_tpu.utils import assert_deterministic, checked, find_nonfinite


class TestChecked:
    def test_passes_clean_fn(self):
        f = checked(lambda x: jnp.sqrt(x) + 1.0)
        out = f(jnp.asarray([1.0, 4.0]))
        np.testing.assert_allclose(np.asarray(out), [2.0, 3.0])

    def test_raises_on_nan(self):
        f = checked(lambda x: jnp.log(x))  # log(-1) -> nan
        with pytest.raises(Exception):
            f(jnp.asarray([-1.0]))

    def test_composes_with_jit(self):
        f = checked(jax.jit(lambda x: x / x))
        with pytest.raises(Exception):
            f(jnp.asarray([0.0]))


class TestDeterminism:
    def test_identical_runs_pass(self):
        f = jax.jit(lambda x: jnp.cumsum(x * 1.0000001))
        x = jnp.linspace(0, 1, 128)
        assert_deterministic(f, x, runs=3)

    def test_detects_difference_via_variant(self):
        x = jnp.arange(16, dtype=jnp.float32)
        with pytest.raises(AssertionError, match="nondeterministic"):
            assert_deterministic(
                lambda a: a, x, variants=[lambda: x + 1e-3]
            )

    def test_two_view_pipeline_bit_deterministic(self):
        """Same inputs -> bit-identical disparity (the golden-test
        precondition, SURVEY.md §7)."""
        from stereovisionarray_tpu.config import CostConfig, SGMConfig
        from stereovisionarray_tpu.models import two_view_disparity

        rng = np.random.default_rng(0)
        base = rng.uniform(0, 255, size=(40, 72)).astype(np.float32)
        left = jnp.asarray(base[:, :64])
        right = jnp.asarray(base[:, 8:])
        cfg_c = CostConfig(num_disparities=16, census_window=(5, 5))
        cfg_s = SGMConfig(num_paths=4)
        assert_deterministic(
            lambda: np.asarray(two_view_disparity(left, right, cfg_c, cfg_s).disparity)
        )


class TestFindNonfinite:
    def test_reports_paths_and_counts(self):
        tree = {"ok": jnp.ones(4), "bad": jnp.asarray([1.0, jnp.nan, jnp.inf])}
        out = find_nonfinite(tree)
        assert len(out) == 1 and list(out.values()) == [2]

    def test_empty_for_clean_tree(self):
        assert find_nonfinite({"a": jnp.zeros(3), "i": jnp.arange(3)}) == {}


class TestInspectCLI:
    def test_inspect_npz_and_pixel_probe(self, tmp_path, capsys):
        from stereovisionarray_tpu.cli import main
        from stereovisionarray_tpu.datasets import save_array

        arr = np.arange(12, dtype=np.float32).reshape(3, 4)
        p = str(tmp_path / "x.npz")
        save_array(p, {"depth": arr}, metadata={"note": "t"})
        rc = main(["inspect", p, "--at", "2", "1"])
        out = json.loads(capsys.readouterr().out)
        assert rc == 0
        assert out["depth"]["shape"] == [3, 4]
        assert out["depth"]["at"]["value"] == 6.0
        assert out["depth"]["nonfinite"] == 0

    def test_inspect_out_of_bounds(self, tmp_path, capsys):
        from stereovisionarray_tpu.cli import main
        from stereovisionarray_tpu.datasets import save_array

        p = str(tmp_path / "x.npz")
        save_array(p, {"d": np.zeros((2, 2), np.float32)})
        main(["inspect", p, "--at", "9", "9"])
        out = json.loads(capsys.readouterr().out)
        assert out["d"]["at"]["value"] is None

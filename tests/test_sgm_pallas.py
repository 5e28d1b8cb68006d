"""Pallas SGM sweep kernels vs the XLA-scan aggregation (interpret mode on
the CPU backend — SURVEY.md §5 'Pallas interpret-mode for kernel
correctness')."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereovisionarray_tpu.ops.sgm import sgm_aggregate, sgm_aggregate_reference
from stereovisionarray_tpu.ops.sgm_pallas import sgm_aggregate_pallas


@pytest.fixture(scope="module")
def vol_img(rng=None):
    r = np.random.default_rng(3)
    vol = jnp.asarray(r.uniform(0, 60, (24, 32, 16)).astype(np.float32))
    img = jnp.asarray(r.uniform(0, 255, (24, 32)).astype(np.float32))
    return vol, img


class TestPallasSGM:
    @pytest.mark.parametrize("num_paths", [4, 8])
    @pytest.mark.parametrize("adaptive", [False, True])
    def test_matches_xla_scan(self, vol_img, num_paths, adaptive):
        vol, img = vol_img
        a = sgm_aggregate(vol, 4.0, 32.0, num_paths, img, adaptive, 8.0)
        b = sgm_aggregate_pallas(
            vol, 4.0, 32.0, num_paths, img, adaptive, 8.0, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-3
        )

    def test_matches_numpy_oracle(self, vol_img):
        """Direct check against the per-pixel dynamic-program oracle."""
        vol, _ = vol_img
        small = vol[:10, :12, :8]
        ref = sgm_aggregate_reference(np.asarray(small), 4.0, 32.0, num_paths=8)
        got = sgm_aggregate_pallas(small, 4.0, 32.0, 8, interpret=True)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-3)

    def test_nonsquare_and_odd_shapes(self):
        r = np.random.default_rng(5)
        for shape in [(7, 33, 16), (16, 7, 8), (9, 9, 8)]:
            vol = jnp.asarray(r.uniform(0, 30, shape).astype(np.float32))
            a = sgm_aggregate(vol, 2.0, 16.0, 8)
            b = sgm_aggregate_pallas(vol, 2.0, 16.0, 8, interpret=True)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-3
            )

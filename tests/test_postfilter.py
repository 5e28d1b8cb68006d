"""Disparity post-filters (ops/postfilter.py): 3x3 median + speckle
suppression — production-SGM steps absent from the reference."""

import numpy as np
import jax.numpy as jnp

from stereovisionarray_tpu.ops.postfilter import (
    fill_holes,
    median3x3,
    speckle_filter,
)
from stereovisionarray_tpu.ops.wta import INVALID_DISPARITY


def _fill_oracle(d, v):
    """Serial numpy oracle: nearest valid left/right per row, background
    (min) where both exist."""
    H, W = d.shape
    out = d.copy()
    ok = v.copy()
    for y in range(H):
        xs = np.where(v[y])[0]
        for x in range(W):
            if v[y, x]:
                continue
            left = xs[xs < x]
            right = xs[xs > x]
            cands = []
            if left.size:
                cands.append(d[y, left[-1]])
            if right.size:
                cands.append(d[y, right[0]])
            if cands:
                out[y, x] = min(cands)
                ok[y, x] = True
    return out, ok


class TestFillHoles:
    def test_matches_serial_oracle(self):
        rng = np.random.default_rng(3)
        d = rng.uniform(0, 64, (12, 37)).astype(np.float32)
        v = rng.uniform(size=(12, 37)) > 0.4
        got, gv = fill_holes(jnp.asarray(d), jnp.asarray(v))
        want, wv = _fill_oracle(d, v)
        assert (np.asarray(gv) == wv).all()
        np.testing.assert_allclose(np.asarray(got)[wv], want[wv], rtol=0, atol=0)

    def test_occlusion_takes_background(self):
        # step scene: high disparity (near) on the left, low (far) right;
        # an occlusion hole at the step must fill from the FAR side
        d = np.full((8, 32), 40.0, dtype=np.float32)
        d[:, 16:] = 10.0
        v = np.ones_like(d, dtype=bool)
        v[:, 14:18] = False
        got, gv = fill_holes(jnp.asarray(d), jnp.asarray(v))
        assert np.asarray(gv).all()
        assert (np.asarray(got)[:, 14:18] == 10.0).all()

    def test_fully_invalid_row_stays_invalid(self):
        d = np.full((4, 16), 5.0, dtype=np.float32)
        v = np.ones_like(d, dtype=bool)
        v[2] = False
        got, gv = fill_holes(jnp.asarray(d), jnp.asarray(v))
        assert not np.asarray(gv)[2].any()
        assert (np.asarray(got)[2] == float(INVALID_DISPARITY)).all()

    def test_single_sided_border_hole(self):
        d = np.full((4, 16), 7.0, dtype=np.float32)
        v = np.ones_like(d, dtype=bool)
        v[:, :3] = False  # left border: only a right-side source exists
        got, gv = fill_holes(jnp.asarray(d), jnp.asarray(v))
        assert np.asarray(gv).all()
        assert (np.asarray(got)[:, :3] == 7.0).all()

    def test_take_max_for_plane_index_maps(self):
        # plane-index convention: index GROWS with depth, so the background
        # surface is the LARGER index (models/cascade_sweep.py coarse fill)
        d = np.full((8, 32), 10.0, dtype=np.float32)  # near surface (low idx)
        d[:, 16:] = 50.0  # far background (high idx)
        v = np.ones_like(d, dtype=bool)
        v[:, 14:18] = False
        got, gv = fill_holes(jnp.asarray(d), jnp.asarray(v), take="max")
        assert np.asarray(gv).all()
        assert (np.asarray(got)[:, 14:18] == 50.0).all()

    def test_take_rejects_unknown(self):
        d = jnp.zeros((4, 8))
        import pytest

        with pytest.raises(ValueError, match="take"):
            fill_holes(d, jnp.ones((4, 8), bool), take="mean")


class TestMedian:
    def test_matches_numpy_median_interior(self):
        rng = np.random.default_rng(0)
        d = rng.uniform(0, 64, (20, 24)).astype(np.float32)
        got = np.asarray(median3x3(jnp.asarray(d)))
        for y in range(1, 19):
            for x in range(1, 23):
                want = np.median(d[y - 1 : y + 2, x - 1 : x + 2])
                assert abs(got[y, x] - want) < 1e-5, (y, x)

    def test_kills_salt_noise(self):
        d = np.full((16, 16), 10.0, dtype=np.float32)
        d[8, 8] = 60.0  # single outlier
        got = np.asarray(median3x3(jnp.asarray(d)))
        assert got[8, 8] == 10.0

    def test_invalid_neighbours_use_center(self):
        d = np.full((8, 8), 5.0, dtype=np.float32)
        v = np.ones((8, 8), dtype=bool)
        d[3, 3] = -1.0
        v[3, 3] = False
        got = np.asarray(median3x3(jnp.asarray(d), jnp.asarray(v)))
        # invalid center passes through; valid neighbours unpolluted
        assert got[3, 3] == -1.0
        assert (got[v] == 5.0).all()


class TestSpeckle:
    def test_small_blob_removed_large_region_kept(self):
        d = np.full((32, 32), 20.0, dtype=np.float32)
        d[10:12, 10:12] = 45.0  # 4-pixel floating blob
        out, keep = speckle_filter(jnp.asarray(d), max_diff=1.0, window=9,
                                   min_support=12)
        out = np.asarray(out)
        assert (out[10:12, 10:12] == float(INVALID_DISPARITY)).all()
        kept = np.asarray(keep)
        assert kept.sum() == 32 * 32 - 4

    def test_discontinuity_preserves_both_sides(self):
        d = np.full((24, 24), 10.0, dtype=np.float32)
        d[:, 12:] = 40.0  # step edge: two large regions
        out, keep = speckle_filter(jnp.asarray(d), max_diff=1.0, window=9,
                                   min_support=12)
        assert np.asarray(keep).all()  # nothing suppressed on either side

    def test_respects_input_validity(self):
        d = np.full((16, 16), 7.0, dtype=np.float32)
        v = np.ones((16, 16), dtype=bool)
        v[:2] = False
        out, keep = speckle_filter(jnp.asarray(d), jnp.asarray(v),
                                   max_diff=1.0, window=5, min_support=6)
        assert not np.asarray(keep)[:2].any()
        assert np.asarray(keep)[4:].all()

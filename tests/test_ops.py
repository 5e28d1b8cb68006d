"""Kernel-level tests: census/BT costs vs brute-force numpy, SGM scan vs the
tiny dynamic-program oracle, WTA/subpixel/LR, warp ops (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereovisionarray_tpu.ops import (
    bilinear_sample,
    birchfield_tomasi_volume,
    census_cost_volume,
    census_transform,
    disparity_from_volume,
    hamming_distance,
    homography_warp,
    right_from_left_volume,
    sgm_aggregate,
    sgm_aggregate_reference,
    splat_depth,
    subpixel_refine,
    warp_with_disparity,
    winner_take_all,
)
from stereovisionarray_tpu.ops.wta import left_right_check, uniqueness_mask


def _np_census(img: np.ndarray, wh: int, ww: int) -> np.ndarray:
    """Brute-force census bits as a (H, W, bits) bool array, edge-padded."""
    ph, pw = wh // 2, ww // 2
    pad = np.pad(img, ((ph, ph), (pw, pw)), mode="edge")
    h, w = img.shape
    bits = []
    for dy in range(-ph, ph + 1):
        for dx in range(-pw, pw + 1):
            if dy == 0 and dx == 0:
                continue
            nb = pad[ph + dy : ph + dy + h, pw + dx : pw + dx + w]
            bits.append(nb < img)
    return np.stack(bits, axis=-1)


class TestCensus:
    @pytest.mark.parametrize("window", [(3, 3), (5, 5), (7, 9)])
    def test_census_matches_bruteforce(self, rng, window):
        img = rng.uniform(0, 255, size=(20, 24)).astype(np.float32)
        packed = np.asarray(census_transform(jnp.asarray(img), window))
        wh, ww = window
        bits = _np_census(img, wh, ww)
        n_bits = wh * ww - 1
        # unpack planes back to bits
        unpacked = np.zeros((20, 24, n_bits), dtype=bool)
        for b in range(n_bits):
            plane, off = b // 32, b % 32
            unpacked[..., b] = (packed[..., plane] >> off) & 1
        np.testing.assert_array_equal(unpacked, bits)

    def test_hamming(self, rng):
        a = rng.integers(0, 2**32, size=(10, 2), dtype=np.uint32)
        b = rng.integers(0, 2**32, size=(10, 2), dtype=np.uint32)
        got = np.asarray(hamming_distance(jnp.asarray(a), jnp.asarray(b)))
        want = np.array(
            [bin(int(x0) ^ int(y0)).count("1") + bin(int(x1) ^ int(y1)).count("1")
             for (x0, x1), (y0, y1) in zip(a, b)],
            dtype=np.float32,
        )
        np.testing.assert_array_equal(got, want)

    def test_cost_volume_zero_at_true_disparity(self, rng):
        """A purely shifted image must give zero census cost at the true
        disparity for interior pixels."""
        d_true = 5
        tex = rng.uniform(0, 255, size=(16, 40 + d_true)).astype(np.float32)
        # right[x - d] == left[x]  =>  left = tex[:, :-d], right = tex[:, d:]
        left = tex[:, :-d_true]
        right = tex[:, d_true:]
        vol = np.asarray(census_cost_volume(jnp.asarray(left), jnp.asarray(right), 8, (5, 5)))
        interior = vol[3:-3, 8:-8]
        assert np.all(interior[..., d_true] == 0)
        d, _ = winner_take_all(jnp.asarray(vol))
        # argmin tie-breaks to the lowest d, and random texture can collide
        # census codes occasionally — any disagreement must be a true zero-cost
        # tie with the correct disparity, never a strictly better wrong match
        d_int = np.asarray(d)[3:-3, 8:-8]
        disagree = d_int != d_true
        assert disagree.mean() < 0.05
        if disagree.any():
            ys, xs = np.nonzero(disagree)
            assert np.all(interior[ys, xs, d_int[disagree]] == 0)

    def test_bt_volume_zero_at_true_disparity(self, rng):
        d_true = 3
        tex = rng.uniform(0, 255, size=(12, 30 + d_true)).astype(np.float32)
        left, right = tex[:, :-d_true], tex[:, d_true:]
        vol = np.asarray(birchfield_tomasi_volume(jnp.asarray(left), jnp.asarray(right), 6))
        assert np.all(vol[:, 6:, d_true] < 1e-4)

    def test_out_of_bounds_disparities_worst_cost(self, rng):
        left = rng.uniform(0, 255, size=(8, 16)).astype(np.float32)
        right = rng.uniform(0, 255, size=(8, 16)).astype(np.float32)
        vol = np.asarray(census_cost_volume(jnp.asarray(left), jnp.asarray(right), 8, (3, 3)))
        for d in range(1, 8):
            assert np.all(vol[:, :d, d] == 8.0)  # 3x3 -> 8 bits max


class TestSGM:
    @pytest.mark.parametrize("num_paths", [4, 8])
    def test_matches_oracle(self, rng, num_paths):
        vol = rng.uniform(0, 20, size=(9, 11, 6)).astype(np.float32)
        got = np.asarray(sgm_aggregate(jnp.asarray(vol), p1=2.0, p2=7.0, num_paths=num_paths))
        want = sgm_aggregate_reference(vol, p1=2.0, p2=7.0, num_paths=num_paths)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)

    def test_zero_cost_stays_zero(self):
        vol = jnp.zeros((6, 7, 5))
        out = np.asarray(sgm_aggregate(vol, num_paths=8))
        np.testing.assert_array_equal(out, 0.0)

    def test_smoothing_fills_ambiguity(self, rng):
        """A pixel with a flat (ambiguous) cost but unambiguous neighbours
        must adopt the neighbourhood disparity after aggregation."""
        h, w, D = 7, 9, 8
        d_true = 3
        vol = np.full((h, w, D), 10.0, dtype=np.float32)
        vol[..., d_true] = 0.0
        vol[3, 4, :] = 5.0  # ambiguous pixel: flat cost
        agg = np.asarray(sgm_aggregate(jnp.asarray(vol), p1=1.0, p2=4.0, num_paths=8))
        assert agg[3, 4].argmin() == d_true

    def test_adaptive_p2_runs(self, rng):
        vol = jnp.asarray(rng.uniform(0, 10, size=(8, 8, 4)).astype(np.float32))
        img = jnp.asarray(rng.uniform(0, 255, size=(8, 8)).astype(np.float32))
        out = sgm_aggregate(vol, image=img, adaptive_p2=True, num_paths=8)
        assert out.shape == vol.shape
        assert bool(jnp.isfinite(out).all())


class TestWTA:
    def test_subpixel_exact_parabola(self):
        """Costs on an exact parabola with minimum at d=3.3 recover 3.3."""
        D = 8
        d_min = 3.3
        d = np.arange(D, dtype=np.float32)
        cost = (d - d_min) ** 2
        vol = jnp.asarray(np.tile(cost, (4, 5, 1)))
        di, _ = winner_take_all(vol)
        ds = subpixel_refine(vol, di)
        np.testing.assert_allclose(np.asarray(ds), d_min, atol=1e-5)

    def test_lr_check_consistent_and_inconsistent(self):
        dl = jnp.full((4, 10), 2.0)
        dr = jnp.full((4, 10), 2.0)
        ok = left_right_check(dl, dr, 1.0)
        assert bool(ok[:, 3:].all())
        dr_bad = dr.at[:, :].set(6.0)
        ok2 = left_right_check(dl, dr_bad, 1.0)
        assert not bool(ok2[:, 3:].any())

    def test_right_volume_reindex(self, rng):
        vol = jnp.asarray(rng.uniform(0, 9, size=(3, 12, 5)).astype(np.float32))
        vr = np.asarray(right_from_left_volume(vol))
        v = np.asarray(vol)
        for y in range(3):
            for x in range(12):
                for d in range(5):
                    assert vr[y, x, d] == v[y, min(x + d, 11), d]

    def test_uniqueness(self):
        vol = np.full((2, 2, 8), 10.0, np.float32)
        vol[0, 0, 4] = 1.0  # unique winner
        vol[1, 1, 2] = 1.0
        vol[1, 1, 6] = 1.01  # near-tie far away -> not unique
        disp = jnp.asarray(np.array([[4, 0], [0, 2]], dtype=np.int32))
        m = np.asarray(uniqueness_mask(jnp.asarray(vol), disp, ratio=0.95))
        assert m[0, 0]
        assert not m[1, 1]

    def test_invalid_sentinel(self):
        vol = jnp.asarray(np.random.default_rng(0).uniform(1, 9, (4, 6, 5)).astype(np.float32))
        mask = jnp.zeros((4, 6), dtype=bool)
        res = disparity_from_volume(vol, mask=mask)
        assert np.all(np.asarray(res.disparity) == -1.0)
        assert not bool(res.valid.any())


class TestWarp:
    def test_bilinear_identity(self, rng):
        img = jnp.asarray(rng.uniform(0, 9, (7, 9)).astype(np.float32))
        v, u = jnp.meshgrid(jnp.arange(7.0), jnp.arange(9.0), indexing="ij")
        val, ok = bilinear_sample(img, jnp.stack([u, v], -1))
        np.testing.assert_allclose(np.asarray(val), np.asarray(img), atol=1e-6)
        assert bool(ok.all())

    def test_bilinear_midpoint(self):
        img = jnp.asarray(np.array([[0.0, 2.0], [4.0, 6.0]], dtype=np.float32))
        val, ok = bilinear_sample(img, jnp.asarray([[0.5, 0.5]]))
        assert float(val[0]) == pytest.approx(3.0)

    def test_bilinear_out_of_bounds(self):
        img = jnp.ones((4, 4))
        val, ok = bilinear_sample(img, jnp.asarray([[-1.0, 0.0], [5.0, 2.0]]), fill=-9.0)
        assert np.all(np.asarray(val) == -9.0)
        assert not bool(ok.any())

    def test_identity_homography(self, rng):
        img = jnp.asarray(rng.uniform(0, 9, (6, 8)).astype(np.float32))
        out, ok = homography_warp(img, jnp.eye(3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_translation_homography(self, rng):
        img = jnp.asarray(rng.uniform(0, 9, (6, 8)).astype(np.float32))
        H = jnp.asarray(np.array([[1, 0, 2], [0, 1, 0], [0, 0, 1]], dtype=np.float32))
        out, ok = homography_warp(img, H)  # ref pixel u samples src at u+2
        np.testing.assert_allclose(np.asarray(out[:, :6]), np.asarray(img[:, 2:]), atol=1e-5)

    def test_warp_with_disparity_shifts(self, rng):
        img = jnp.asarray(rng.uniform(0, 9, (5, 12)).astype(np.float32))
        disp = jnp.full((5, 12), 3.0)
        out, ok = warp_with_disparity(img, disp, jnp.asarray([1.0, 0.0]))
        np.testing.assert_allclose(np.asarray(out[:, :9]), np.asarray(img[:, 3:]), atol=1e-5)

    def test_splat_depth_min_z_wins(self):
        depth = jnp.asarray(np.array([[2.0, 5.0]], dtype=np.float32))
        # both pixels land on target (0, 0): shifts 0 and -1
        shift = jnp.asarray(np.array([[[0.0, 0.0], [-1.0, 0.0]]], dtype=np.float32))
        out = np.asarray(splat_depth(depth, shift))
        assert out[0, 0] == 2.0  # nearer surface wins
        assert out[0, 1] == 0.0  # hole


class TestGradients:
    def test_pipeline_is_differentiable(self, rng):
        """BT cost + soft aggregation must be differentiable end-to-end (the
        hook for learned refinement later)."""
        left = jnp.asarray(rng.uniform(0, 1, (8, 10)).astype(np.float32))
        right = jnp.asarray(rng.uniform(0, 1, (8, 10)).astype(np.float32))

        def loss(l):
            vol = birchfield_tomasi_volume(l, right, 4)
            agg = sgm_aggregate(vol, num_paths=4)
            return jnp.sum(jax.nn.softmax(-agg, axis=-1) * jnp.arange(4.0))

        g = jax.grad(loss)(left)
        assert np.all(np.isfinite(np.asarray(g)))

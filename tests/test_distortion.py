"""Lens distortion (geometry/distortion.py): point round trips, image
round trips, and the end-to-end story — distortion breaks rectified
matching, ingest undistortion restores it."""

import numpy as np
import jax.numpy as jnp

from stereovisionarray_tpu.geometry.camera import translation_only_array
from stereovisionarray_tpu.geometry.distortion import (
    Distortion,
    distort_image,
    distort_points,
    undistort_image,
    undistort_points,
)

DIST = Distortion(k1=-0.25, k2=0.08, p1=0.001, p2=-0.002)


class TestPoints:
    def test_round_trip(self):
        r = np.random.default_rng(0)
        xy = jnp.asarray(r.uniform(-0.5, 0.5, (500, 2)).astype(np.float32))
        back = undistort_points(distort_points(xy, DIST), DIST)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xy), atol=2e-6)

    def test_identity_when_zero(self):
        xy = jnp.asarray(np.linspace(-1, 1, 20, dtype=np.float32).reshape(10, 2))
        np.testing.assert_array_equal(
            np.asarray(distort_points(xy, Distortion())), np.asarray(xy))

    def test_barrel_pulls_inward(self):
        # k1 < 0 (barrel): distorted radius < ideal radius off-center
        xy = jnp.asarray([[0.4, 0.3]])
        d = distort_points(xy, Distortion(k1=-0.3))
        assert np.linalg.norm(np.asarray(d)) < np.linalg.norm(np.asarray(xy))


class TestImages:
    def test_image_round_trip(self):
        h, w = 64, 96
        # smooth analytic image: bilinear resampling round-trips closely
        v, u = np.mgrid[0:h, 0:w].astype(np.float32)
        img = jnp.asarray(
            100.0 + 60.0 * np.sin(u / 9.0) + 50.0 * np.cos(v / 7.0)
        )
        cam = translation_only_array(
            0.05, np.zeros((1, 3), np.float32), 0.036 / w, resolution=(h, w)
        )[0]
        d_img, _ = distort_image(img, cam, DIST)
        rec, ok = undistort_image(d_img, cam, DIST)
        inner = np.s_[8:-8, 8:-8]
        assert np.asarray(ok)[inner].all()
        err = np.abs(np.asarray(rec) - np.asarray(img))[inner]
        assert np.median(err) < 0.5
        assert err.max() < 6.0  # double-bilinear worst case on curvature


class TestEndToEnd:
    def test_undistortion_flattens_disparity_field(self):
        """Distortion does NOT break local matching when both views share
        the lens — it BENDS the recovered disparity field (the metric
        geometry is wrong: a constant-disparity plane reads as a curved
        surface). Ingest undistortion must flatten it back."""
        from stereovisionarray_tpu.config import CostConfig, SGMConfig
        from stereovisionarray_tpu.models.two_view import two_view_disparity

        r = np.random.default_rng(2)
        h, w, d_true, D = 80, 160, 10, 24
        strong = Distortion(k1=-0.35, k2=0.1)

        def box(img):
            p = np.pad(img, 1, mode="edge")
            return (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:] + p[1:-1, :-2]
                    + p[1:-1, 1:-1] + p[1:-1, 2:] + p[2:, :-2] + p[2:, 1:-1]
                    + p[2:, 2:]) / 9.0

        base = box(r.uniform(0, 255, (h, w + d_true)).astype(np.float32))
        left = jnp.asarray(base[:, :w])
        right = jnp.asarray(base[:, d_true:])
        cam = translation_only_array(
            0.05, np.zeros((1, 3), np.float32), 0.036 / w, resolution=(h, w)
        )[0]
        dl, _ = distort_image(left, cam, strong)
        dr, _ = distort_image(right, cam, strong)
        ul, uvalid_l = undistort_image(dl, cam, strong)
        ur, _ = undistort_image(dr, cam, strong)

        ccfg = CostConfig(num_disparities=D, census_window=(5, 5))
        scfg = SGMConfig(num_paths=4, uniqueness=0.0, lr_max_diff=0.0)

        def dev95(l_, r_):
            """p95 |disparity - d_true| over the interior (subpixel)."""
            out = two_view_disparity(l_, r_, ccfg, scfg, backend="xla")
            inner = np.s_[8:-8, D + 4:-8]
            dd = np.asarray(out.disparity)[inner]
            return float(np.percentile(np.abs(dd - d_true), 95))

        e_clean = dev95(left, right)
        e_dist = dev95(dl, dr)
        e_und = dev95(ul, ur)
        assert e_clean < 0.35  # flat plane reads flat
        # the bent field deviates by ~d * k1 * (3x^2 + y^2) toward the
        # edges (~1 px at this geometry) — clearly above the clean noise
        assert e_dist > 2.5 * e_clean, (e_dist, e_clean)
        assert e_dist > 0.6
        # ingest undistortion flattens it back (resampling loss only)
        assert e_und < 1.5 * e_clean + 0.1, (e_und, e_clean)
        # undistorted validity covers the interior
        assert np.asarray(uvalid_l)[8:-8, 8:-8].mean() > 0.95

"""Tests for the ROI/face-mask subsystem (reference component C8)."""

import jax.numpy as jnp
import numpy as np

from stereovisionarray_tpu.roi import (
    convex_polygon_mask,
    detect_face_ellipse,
    ellipse_mask,
    face_ellipse_from_landmarks,
    face_mask_from_landmarks,
)


class TestMasks:
    def test_ellipse_mask_geometry(self):
        m = np.asarray(
            ellipse_mask((64, 64), jnp.array([32.0, 32.0]), jnp.array([10.0, 20.0]))
        )
        assert m[32, 32] and m[32, 41] and not m[32, 43]  # u semi-axis 10
        assert m[51, 32] and not m[53, 32]  # v semi-axis 20
        # area approx pi*a*b
        assert abs(m.sum() - np.pi * 10 * 20) / (np.pi * 10 * 20) < 0.05

    def test_ellipse_rotation(self):
        m = np.asarray(
            ellipse_mask(
                (64, 64),
                jnp.array([32.0, 32.0]),
                jnp.array([20.0, 5.0]),
                jnp.asarray(np.pi / 2),
            )
        )
        # rotated 90deg: long axis now vertical
        assert m[50, 32] and not m[32, 50]

    def test_polygon_mask_vs_oracle(self, rng):
        # random convex polygon: hull of random points
        pts = rng.uniform(10, 54, size=(12, 2)).astype(np.float32)
        c = pts.mean(0)
        ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
        poly = pts[np.argsort(ang)]  # star-shaped orderings of random pts
        # make it convex: monotone-chain hull
        def hull(points):
            points = sorted(map(tuple, points))
            def half(pts_iter):
                out = []
                for p in pts_iter:
                    while len(out) >= 2 and (
                        (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                        - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                    ) <= 0:
                        out.pop()
                    out.append(p)
                return out
            lower = half(points)
            upper = half(reversed(points))
            return np.array(lower[:-1] + upper[:-1], dtype=np.float32)

        poly = hull(pts)
        m = np.asarray(convex_polygon_mask((64, 64), jnp.asarray(poly)))
        # oracle: matplotlib-free point-in-polygon via sign test
        v, u = np.mgrid[0:64, 0:64].astype(np.float32)
        inside = np.ones((64, 64), bool)
        for i in range(len(poly)):
            p0, p1 = poly[i], poly[(i + 1) % len(poly)]
            cross = (p1[0] - p0[0]) * (v - p0[1]) - (p1[1] - p0[1]) * (u - p0[0])
            inside &= cross >= 0
        if inside.sum() == 0:  # orientation flipped
            inside = np.ones((64, 64), bool)
            for i in range(len(poly)):
                p0, p1 = poly[i], poly[(i + 1) % len(poly)]
                cross = (p1[0] - p0[0]) * (v - p0[1]) - (p1[1] - p0[1]) * (u - p0[0])
                inside &= cross <= 0
        np.testing.assert_array_equal(m, inside)

    def test_landmark_recipes(self):
        # synthetic 68 landmarks: jaw on a semicircle, brows above
        t = np.linspace(np.pi, 2 * np.pi, 17)
        jaw = np.stack([32 + 20 * np.cos(t), 30 - 25 * np.sin(t)], -1)
        lm = np.zeros((68, 2), np.float32)
        lm[0:17] = jaw
        lm[19] = [24, 8]
        lm[24] = [40, 8]
        m = np.asarray(face_mask_from_landmarks((64, 64), jnp.asarray(lm)))
        assert m[30, 32]  # face interior
        assert not m[5, 5] and not m[60, 60]
        center, axes, angle = face_ellipse_from_landmarks(jnp.asarray(lm))
        c = np.asarray(center)
        assert 25 < c[0] < 40 and 10 < c[1] < 45
        assert float(axes[1]) / float(axes[0]) == 1.7


class TestDetector:
    def test_detects_bright_blob(self, rng):
        img = rng.uniform(10, 30, size=(96, 128)).astype(np.float32)
        vv, uu = np.mgrid[0:96, 0:128].astype(np.float32)
        blob = ((uu - 70) / 18) ** 2 + ((vv - 40) / 25) ** 2 <= 1.0
        img[blob] += 150.0
        roi = detect_face_ellipse(jnp.asarray(img))
        assert bool(roi.found)
        c = np.asarray(roi.center)
        assert abs(c[0] - 70) < 4 and abs(c[1] - 40) < 4
        # mask from detection covers most of the blob
        m = np.asarray(ellipse_mask((96, 128), roi.center, roi.axes, roi.angle))
        overlap = (m & blob).sum() / blob.sum()
        assert overlap > 0.7, f"blob coverage {overlap}"

    def test_darker_subject_invert(self, rng):
        img = rng.uniform(200, 230, size=(96, 128)).astype(np.float32)
        vv, uu = np.mgrid[0:96, 0:128].astype(np.float32)
        blob = ((uu - 50) / 20) ** 2 + ((vv - 50) / 20) ** 2 <= 1.0
        img[blob] -= 150.0
        roi = detect_face_ellipse(jnp.asarray(img), invert=True)
        c = np.asarray(roi.center)
        assert abs(c[0] - 50) < 4 and abs(c[1] - 50) < 4

    def test_pipeline_gating(self, rng):
        """Mask gates the two-view output exactly like the reference's
        per-pixel mask check (/root/reference/src/CameraStereoVision.cpp:53)."""
        from stereovisionarray_tpu.config import CostConfig, SGMConfig
        from stereovisionarray_tpu.models.two_view import two_view_disparity

        base = rng.uniform(0, 255, size=(48, 70)).astype(np.float32)
        left = base[:, :64]
        right = base[:, 5:69]
        mask = np.asarray(
            ellipse_mask((48, 64), jnp.array([32.0, 24.0]), jnp.array([15.0, 12.0]))
        )
        out = two_view_disparity(
            jnp.asarray(left), jnp.asarray(right),
            CostConfig(num_disparities=16, census_window=(5, 5)),
            SGMConfig(p1=4.0, p2=32.0),
            mask=jnp.asarray(mask),
        )
        v = np.asarray(out.valid)
        assert not v[~mask].any()

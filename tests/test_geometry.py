"""Unit tests for the camera/geometry layer (SURVEY.md §4: project/inv_project
round-trips, epipolar sampling vs analytic, Lie-group identities)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereovisionarray_tpu.geometry import (
    CameraArray,
    PairTopology,
    camera_pairs,
    epipolar_candidates,
    make_camera_array,
    pair_groups,
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
    translation_only_array,
)
from stereovisionarray_tpu.geometry.epipolar import inverse_depth_samples, pixel_grid
from stereovisionarray_tpu.geometry.topology import grid_positions


def _rig(h=64, w=96):
    pos = grid_positions(5, 5, 0.05, origin=(-0.1, -0.1), z=-0.75)
    return translation_only_array(0.05, pos, 0.036 / w, resolution=(h, w))


class TestCameraArray:
    def test_project_backproject_roundtrip(self, rng):
        cams = _rig()
        cam = cams[12]
        uv = jnp.asarray(rng.uniform(0, 90, size=(50, 2)), dtype=jnp.float32)
        depth = jnp.asarray(rng.uniform(0.3, 1.5, size=(50,)), dtype=jnp.float32)
        pts = cam.backproject(uv, depth)
        uv2, z2 = cam.project(pts)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(z2), np.asarray(depth), rtol=1e-5)

    def test_translation_only_matches_reference_formula(self):
        """Our pinhole with R=I, principal point = image center reproduces the
        reference Camera::project (src/Camera.cpp:15-22) up to the center
        offset the reference applies at call sites."""
        h, w = 64, 96
        pixel_size = 0.036 / w
        f = 0.05
        cams = _rig(h, w)
        cam = cams[12]
        C = np.asarray(cam.centers)
        P = np.array([0.03, -0.02, 0.4], dtype=np.float32)
        mult = f / (P[2] - C[2]) / pixel_size
        ref_x = (P[0] - C[0]) * mult
        ref_y = (P[1] - C[1]) * mult
        uv, z = cam.project(jnp.asarray(P))
        assert np.allclose(float(uv[0]) - w / 2.0, ref_x, atol=1e-3)
        assert np.allclose(float(uv[1]) - h / 2.0, ref_y, atol=1e-3)
        assert np.allclose(float(z), P[2] - C[2], atol=1e-6)

    def test_pixel_rays_unit_norm_and_direction(self):
        cams = _rig()
        cam = cams[12]
        uv = pixel_grid(8, 8)
        rays = cam.pixel_rays(uv)
        norms = jnp.linalg.norm(rays, axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)
        # ray through the principal point is the optical axis (0,0,1) for R=I
        center_ray = cam.pixel_rays(jnp.stack([cam.cx, cam.cy]))
        np.testing.assert_allclose(np.asarray(center_ray), [0.0, 0.0, 1.0], atol=1e-6)

    def test_batched_projection_matches_loop(self, rng):
        cams = _rig()
        pts = jnp.asarray(rng.normal(size=(25, 10, 3)) * 0.2 + np.array([0, 0, 0.3]),
                          dtype=jnp.float32)
        uv_b, z_b = cams.project(pts)
        for i in [0, 7, 24]:
            uv_i, z_i = cams[i].project(pts[i])
            np.testing.assert_allclose(np.asarray(uv_b[i]), np.asarray(uv_i), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(z_b[i]), np.asarray(z_i), rtol=1e-5)

    def test_centers(self):
        pos = grid_positions(5, 5, 0.05, origin=(-0.1, -0.1), z=-0.75)
        cams = _rig()
        np.testing.assert_allclose(np.asarray(cams.centers), pos, atol=1e-6)

    def test_homography_consistent_with_reprojection(self, rng):
        """Warping a ref pixel by H(d) must equal backproject@d -> project."""
        cams = _rig()
        depths = jnp.array([0.4, 0.75, 1.2], dtype=jnp.float32)
        H = cams.fronto_plane_homography(12, jnp.array([11, 7]), depths)
        assert H.shape == (2, 3, 3, 3)
        uv = jnp.asarray(rng.uniform(10, 80, size=(20, 2)), dtype=jnp.float32)
        for si, src in enumerate([11, 7]):
            for di, d in enumerate([0.4, 0.75, 1.2]):
                pts = cams[12].backproject(uv, jnp.full((20,), d, dtype=jnp.float32))
                uv_direct, _ = cams[src].project(pts)
                ones = jnp.ones((20, 1), dtype=jnp.float32)
                homog = jnp.concatenate([uv, ones], axis=-1) @ H[si, di].T
                uv_h = homog[:, :2] / homog[:, 2:3]
                np.testing.assert_allclose(
                    np.asarray(uv_h), np.asarray(uv_direct), rtol=1e-3, atol=5e-2
                )


class TestLie:
    def test_so3_exp_log_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(32, 3)) * 0.8, dtype=jnp.float32)
        R = so3_exp(w)
        # orthonormality
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.asarray(eye), atol=1e-5)
        w2 = so3_log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)

    def test_so3_small_angle(self):
        w = jnp.array([[1e-9, 0, 0], [0, 0, 0]], dtype=jnp.float32)
        R = so3_exp(w)
        assert np.all(np.isfinite(np.asarray(R)))
        g = jax.grad(lambda v: so3_exp(v).sum())(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_se3_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(16, 6)) * 0.5, dtype=jnp.float32)
        R, t = se3_exp(xi)
        xi2 = se3_log(R, t)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


class TestTopology:
    def test_to_center_24_pairs(self):
        p = camera_pairs(PairTopology.TO_CENTER)
        assert p.shape == (24, 2)
        assert np.all(p[:, 0] == 12)
        assert 12 not in p[:, 1]

    def test_to_center_small_ring(self):
        p = camera_pairs(PairTopology.TO_CENTER_SMALL)
        assert p.shape == (8, 2)
        assert sorted(p[:, 1].tolist()) == [6, 7, 8, 11, 13, 16, 17, 18]

    def test_mid_left_mid_top(self):
        assert camera_pairs(PairTopology.MID_LEFT).tolist() == [[12, 11]]
        assert camera_pairs(PairTopology.MID_TOP).tolist() == [[12, 7]]

    def test_cross_and_jump_cross(self):
        p = camera_pairs(PairTopology.CROSS)
        assert sorted(p[:, 1].tolist()) == [7, 11, 13, 17]
        p2 = camera_pairs(PairTopology.JUMP_CROSS)
        assert sorted(p2[:, 1].tolist()) == [2, 10, 14, 22]

    def test_lines(self):
        ph = camera_pairs(PairTopology.LINE_HORIZONTAL)
        assert sorted(ph[:, 1].tolist()) == [10, 11, 13, 14]
        pv = camera_pairs(PairTopology.LINE_VERTICAL)
        assert sorted(pv[:, 1].tolist()) == [2, 7, 17, 22]

    def test_cross_around_corner_clips(self):
        """The fixed version of the reference bug at functions.cpp:205 — a
        corner camera keeps only its in-grid neighbours."""
        from stereovisionarray_tpu.geometry.topology import cross_pairs_around

        p = cross_pairs_around(0, 5, 5)
        assert sorted(p[:, 1].tolist()) == [1, 5]
        assert np.all(p[:, 0] == 0)

    def test_topology_case_insensitive(self):
        """Config files/CLI use the reference's upper-case spellings
        (functions.h:8-19); the enum must accept them (bench_array.py
        passes topology="CROSS")."""
        assert PairTopology("CROSS") is PairTopology.CROSS
        assert PairTopology("Jump_Cross") is PairTopology.JUMP_CROSS
        assert PairTopology("to_center") is PairTopology.TO_CENTER
        with pytest.raises(ValueError):
            PairTopology("not_a_topology")

    def test_chess_groups(self):
        groups = pair_groups("CHESS")
        assert len(groups) == 13  # even indices 0..24
        for g in groups:
            assert g.ndim == 2 and g.shape[1] == 2


class TestEpipolar:
    def test_rectified_pair_candidates_are_horizontal(self):
        """For a purely horizontal baseline with R=I, candidates for a pixel
        lie on the same row (the rectified case)."""
        cams = _rig()
        depths = inverse_depth_samples(0.4, 1.2, 8)
        cand = epipolar_candidates(cams, 12, 11, (64, 96), depths)
        assert cand.shape == (8, 64, 96, 2)
        v_ref = pixel_grid(64, 96)[..., 1]
        for d in range(8):
            np.testing.assert_allclose(np.asarray(cand[d, ..., 1]), np.asarray(v_ref), atol=1e-3)

    def test_candidates_match_bresenham_endpoints(self):
        """Endpoints of the candidate chain equal the projections the
        reference feeds to bresenham (CameraStereoVision.cpp:60-73)."""
        cams = _rig()
        near, far = 0.5, 1.0
        cand = epipolar_candidates(cams, 12, 7, (64, 96), jnp.array([near, far]))
        uv = jnp.array([[48.0, 32.0]], dtype=jnp.float32)
        for di, d in enumerate([near, far]):
            pts = cams[12].backproject(uv, jnp.array([d], dtype=jnp.float32))
            uv_src, _ = cams[7].project(pts)
            np.testing.assert_allclose(
                np.asarray(cand[di, 32, 48]), np.asarray(uv_src[0]), atol=1e-2
            )

    def test_inverse_depth_monotonic(self):
        z = inverse_depth_samples(0.5, 2.0, 16)
        assert z.shape == (16,)
        assert float(z[0]) == pytest.approx(0.5, rel=1e-5)
        assert float(z[-1]) == pytest.approx(2.0, rel=1e-5)
        assert np.all(np.diff(np.asarray(z)) > 0)


class TestConfig:
    def test_roundtrip_and_override(self):
        from stereovisionarray_tpu.config import EngineConfig

        cfg = EngineConfig()
        cfg2 = EngineConfig.from_json(cfg.to_json())
        assert cfg == cfg2
        cfg3 = cfg.override(**{"sgm.p1": 10.0, "cost.num_disparities": 64})
        assert cfg3.sgm.p1 == 10.0
        assert cfg3.cost.num_disparities == 64
        with pytest.raises(KeyError):
            cfg.override(**{"sgm.nope": 1})


class TestLieSmallAngleStability:
    """Regression: se3_exp/log closed forms catastrophically cancelled in
    float32 for angles in [1e-4, 1e-2] rad ((1-cos t) rounds to 0), which
    NaN'd pose-graph LM steps. Round trips must be finite and tight across
    the whole band."""

    def test_se3_round_trip_across_angle_bands(self):
        import numpy as np
        from stereovisionarray_tpu.geometry import se3_exp, se3_log

        r = np.random.default_rng(0)
        for mag in (1e-6, 1e-5, 1e-4, 3e-4, 1e-3, 3e-3, 1e-2, 0.05, 0.2, 1.0, 2.5):
            w = r.normal(size=(32, 3)).astype(np.float32)
            w *= mag / np.linalg.norm(w, axis=-1, keepdims=True)
            v = r.normal(0, 0.5, size=(32, 3)).astype(np.float32)
            xi = jnp.asarray(np.concatenate([w, v], -1))
            R, t = se3_exp(xi)
            xi2 = se3_log(R, t)
            assert np.isfinite(np.asarray(xi2)).all(), f"mag {mag}"
            # rotation part limited by so3_log arccos resolution (~5e-4 f32)
            np.testing.assert_allclose(
                np.asarray(xi2[:, :3]), np.asarray(xi[:, :3]), atol=7e-4,
                err_msg=f"w at mag {mag}")
            np.testing.assert_allclose(
                np.asarray(xi2[:, 3:]), np.asarray(xi[:, 3:]), rtol=2e-3,
                atol=1e-3, err_msg=f"v at mag {mag}")

    def test_se3_log_gradients_finite_in_cancellation_band(self):
        import numpy as np
        from stereovisionarray_tpu.geometry import se3_exp, se3_log

        def f(xi):
            R, t = se3_exp(xi)
            return jnp.sum(se3_log(R, t) ** 2)

        for mag in (1e-5, 1e-4, 1e-3, 1e-2, 0.1, 1.0):
            xi = jnp.asarray([[0.6, -0.8, 0.0, 0.1, 0.2, -0.3]], dtype=jnp.float32)
            xi = xi.at[:, :3].multiply(mag)
            g = jax.grad(f)(xi)
            assert np.isfinite(np.asarray(g)).all(), f"mag {mag}"

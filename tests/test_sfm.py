"""Unit + golden tests for the SfM layer (BASELINE.json config 4):
features, matching, triangulation, bundle adjustment, pose graph."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereovisionarray_tpu.geometry.camera import (
    make_camera_array,
    translation_only_array,
)
from stereovisionarray_tpu.evaluation.metrics import absolute_trajectory_error
from stereovisionarray_tpu.geometry.lie import so3_exp
from stereovisionarray_tpu.sfm import (
    BAProblem,
    PoseGraph,
    bundle_adjust,
    extract_features,
    match_descriptors,
    pose_graph_optimize,
    triangulate_midpoint,
)


def _corner_image(h=96, w=128, seed=0):
    """Blobby random texture with strong corners at known lattice sites."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(90, 110, size=(h, w)).astype(np.float32)
    corners = []
    for y in range(16, h - 16, 24):
        for x in range(16, w - 16, 24):
            img[y : y + 8, x : x + 8] += 120.0  # bright square -> 4 corners
            corners.append((x, y))
    return img, corners


class TestFeatures:
    def test_detects_square_corners(self):
        img, corners = _corner_image()
        f = extract_features(jnp.asarray(img), max_features=256)
        uv = np.asarray(f.uv)[np.asarray(f.valid)]
        # every square corner should have a detection within 2 px
        for (x, y) in corners:
            for cx, cy in ((x, y), (x + 7, y + 7)):
                d = np.sqrt(((uv - [cx, cy]) ** 2).sum(-1)).min()
                assert d < 2.5, f"no corner near ({cx},{cy}), nearest {d}"

    def test_descriptors_normalized(self):
        img, _ = _corner_image()
        f = extract_features(jnp.asarray(img), max_features=64)
        n = np.linalg.norm(np.asarray(f.descriptor), axis=-1)
        np.testing.assert_allclose(n[np.asarray(f.valid)], 1.0, atol=1e-4)


class TestMatching:
    def test_shifted_image_matches(self):
        img, _ = _corner_image()
        shift = 6
        img_b = np.roll(img, shift, axis=1)
        fa = extract_features(jnp.asarray(img), max_features=128)
        fb = extract_features(jnp.asarray(img_b), max_features=128)
        m = match_descriptors(fa.descriptor, fb.descriptor, fa.valid, fb.valid)
        ok = np.asarray(m.valid)
        assert ok.sum() > 20
        uva = np.asarray(fa.uv)[ok]
        uvb = np.asarray(fb.uv)[np.asarray(m.idx_b)[ok]]
        dx = uvb[:, 0] - uva[:, 0]
        dy = uvb[:, 1] - uva[:, 1]
        # wrap-around columns break the shift relation; majority must agree
        good = (np.abs(dx - shift) < 1.0) & (np.abs(dy) < 1.0)
        assert good.mean() > 0.9


def _rig_and_points(n_pts=64, seed=0, noise=0.0):
    """5-camera mini-rig + random points in front of it, exact projections."""
    rng = np.random.default_rng(seed)
    pos = np.array(
        [[0, 0, -0.75], [0.05, 0, -0.75], [0, 0.05, -0.75],
         [-0.05, 0, -0.75], [0, -0.05, -0.75]],
        dtype=np.float32,
    )
    cams = translation_only_array(0.05, pos, 0.036 / 360, resolution=(270, 360))
    X = np.stack(
        [
            rng.uniform(-0.08, 0.08, n_pts),
            rng.uniform(-0.08, 0.08, n_pts),
            rng.uniform(0.1, 0.3, n_pts),
        ],
        axis=-1,
    ).astype(np.float32)
    n_cams = len(cams)
    cam_idx = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    pt_idx = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    uv, z = cams[jnp.asarray(cam_idx)].project_each(jnp.asarray(X)[jnp.asarray(pt_idx)])
    uv = np.asarray(uv) + rng.normal(0, noise, size=(len(cam_idx), 2)).astype(np.float32)
    valid = np.ones(len(cam_idx), dtype=bool)
    return cams, X, cam_idx, pt_idx, uv, valid


class TestTriangulation:
    def test_recovers_points(self):
        cams, X, cam_idx, pt_idx, uv, valid = _rig_and_points()
        Xh, ok = triangulate_midpoint(
            cams, jnp.asarray(cam_idx), jnp.asarray(uv), jnp.asarray(valid),
            X.shape[0], jnp.asarray(pt_idx),
        )
        assert np.asarray(ok).all()
        np.testing.assert_allclose(np.asarray(Xh), X, atol=1e-3)

    def test_single_ray_invalid(self):
        cams, X, cam_idx, pt_idx, uv, valid = _rig_and_points(n_pts=4)
        # keep only camera-0 observations: 1 ray per point -> not ok
        valid = cam_idx == 0
        _, ok = triangulate_midpoint(
            cams, jnp.asarray(cam_idx), jnp.asarray(uv), jnp.asarray(valid),
            X.shape[0], jnp.asarray(pt_idx),
        )
        assert not np.asarray(ok).any()


class TestBundleAdjust:
    def _perturbed(self, cams, X, rng, rot=0.01, trans=0.005, pts=0.01):
        n = len(cams)
        dw = rng.normal(0, rot, (n, 3)).astype(np.float32)
        dw[0] = 0  # keep gauge camera at truth
        dR = np.asarray(so3_exp(jnp.asarray(dw)))
        R = dR @ np.asarray(cams.R)
        t = np.einsum("nij,nj->ni", dR, np.asarray(cams.t)) + rng.normal(
            0, trans, (n, 3)
        ).astype(np.float32) * np.array([1, 1, 1], np.float32)
        t[0] = np.asarray(cams.t)[0]
        cams_bad = make_camera_array(cams.fx, cams.fy, cams.cx, cams.cy, R, t)
        X_bad = X + rng.normal(0, pts, X.shape).astype(np.float32)
        return cams_bad, X_bad

    def test_converges_to_truth(self, rng):
        cams, X, cam_idx, pt_idx, uv, valid = _rig_and_points(noise=0.0)
        cams_bad, X_bad = self._perturbed(cams, X, rng)
        # BA works on principal-point-centred measurements
        uv_c = uv - np.stack(
            [np.asarray(cams.cx)[cam_idx], np.asarray(cams.cy)[cam_idx]], -1
        )
        prob = BAProblem(
            cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
            uv=jnp.asarray(uv_c), valid=jnp.asarray(valid),
        )
        state = bundle_adjust(
            cams_bad, jnp.asarray(X_bad), prob, iterations=15, damping=1e-4
        )
        costs = np.asarray(state.cost)
        assert costs[-1] < 1e-4, f"final reproj cost {costs[-1]}"
        assert costs[-1] < costs[0] * 1e-3
        # camera centers recovered up to the Sim(3) gauge (BA's scale is
        # pinned to the *perturbed* input baseline, so align scale too)
        ate = float(absolute_trajectory_error(
            state.cameras.centers, cams.centers, align_scale=True))
        assert ate < 1e-5, f"ATE {ate}"

    def test_robust_to_outliers(self, rng):
        cams, X, cam_idx, pt_idx, uv, valid = _rig_and_points(noise=0.0)
        cams_bad, X_bad = self._perturbed(cams, X, rng)
        uv_out = uv.copy()
        n_out = len(uv) // 10
        idx = rng.choice(len(uv), n_out, replace=False)
        uv_out[idx] += rng.uniform(30, 80, (n_out, 2)).astype(np.float32)
        uv_c = uv_out - np.stack(
            [np.asarray(cams.cx)[cam_idx], np.asarray(cams.cy)[cam_idx]], -1
        )
        prob = BAProblem(
            cam_idx=jnp.asarray(cam_idx), pt_idx=jnp.asarray(pt_idx),
            uv=jnp.asarray(uv_c), valid=jnp.asarray(valid),
        )
        state = bundle_adjust(
            cams_bad, jnp.asarray(X_bad), prob, iterations=20, damping=1e-4,
            huber=2.0, kernel="tukey",
        )
        ate = float(absolute_trajectory_error(
            state.cameras.centers, cams.centers, align_scale=True))
        assert ate < 1e-4, f"ATE with outliers {ate}"


class TestPoseGraph:
    def test_recovers_from_noisy_init(self, rng):
        n = 9
        # ground-truth poses: 3x3 grid, small random rotations
        w_true = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
        R_true = np.asarray(so3_exp(jnp.asarray(w_true))).copy()
        t_true = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
        R_true[0] = np.eye(3)
        t_true[0] = 0
        # edges: chain + ring, exact measurements
        ei = np.array([i for i in range(n - 1)] + [n - 1], dtype=np.int32)
        ej = np.array([i + 1 for i in range(n - 1)] + [0], dtype=np.int32)
        R_rel = np.einsum("eik,ejk->eij", R_true[ej], R_true[ei])
        t_rel = t_true[ej] - np.einsum("eij,ej->ei", R_rel, t_true[ei])
        graph = PoseGraph(
            edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
            R_meas=jnp.asarray(R_rel), t_meas=jnp.asarray(t_rel),
            weight=jnp.ones(len(ei), dtype=jnp.float32),
        )
        # noisy init (camera 0 at truth, it is the gauge)
        dw = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
        dw[0] = 0
        dR = np.asarray(so3_exp(jnp.asarray(dw))).copy()
        R0 = dR @ R_true
        t0 = t_true + rng.normal(0, 0.05, (n, 3)).astype(np.float32)
        t0[0] = 0
        R_f, t_f, costs = pose_graph_optimize(
            jnp.asarray(R0), jnp.asarray(t0), graph, iterations=10
        )
        assert np.asarray(costs)[-1] < 1e-6
        np.testing.assert_allclose(np.asarray(R_f), R_true, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_f), t_true, atol=1e-4)

    def test_never_diverges_across_seeds(self):
        """Regression: pure GN could diverge to NaN on some noisy inits
        (ill-conditioned normal system -> huge step); LM step control must
        keep every seed finite and strictly reduce cost."""
        for seed in range(12):
            r = np.random.default_rng(seed)
            n = 9
            w_true = r.normal(0, 0.08, (n, 3)).astype(np.float32)
            R_true = np.asarray(so3_exp(jnp.asarray(w_true))).copy()
            t_true = r.normal(0, 0.3, (n, 3)).astype(np.float32)
            R_true[0] = np.eye(3)
            t_true[0] = 0
            ei = np.array([i for i in range(n - 1)] + [n - 1], dtype=np.int32)
            ej = np.array([i + 1 for i in range(n - 1)] + [0], dtype=np.int32)
            R_rel = np.einsum("eik,ejk->eij", R_true[ej], R_true[ei])
            t_rel = t_true[ej] - np.einsum("eij,ej->ei", R_rel, t_true[ei])
            graph = PoseGraph(
                edge_i=jnp.asarray(ei), edge_j=jnp.asarray(ej),
                R_meas=jnp.asarray(R_rel), t_meas=jnp.asarray(t_rel),
                weight=jnp.ones(len(ei), dtype=jnp.float32),
            )
            dw = r.normal(0, 0.08, (n, 3)).astype(np.float32)
            dw[0] = 0
            dR = np.asarray(so3_exp(jnp.asarray(dw))).copy()
            R0 = dR @ R_true
            t0 = t_true + r.normal(0, 0.08, (n, 3)).astype(np.float32)
            t0[0] = 0
            R_f, t_f, costs = pose_graph_optimize(
                jnp.asarray(R0), jnp.asarray(t0), graph, iterations=15
            )
            c = np.asarray(costs)
            assert np.isfinite(c).all(), f"seed {seed}: NaN cost {c}"
            assert np.isfinite(np.asarray(R_f)).all() and np.isfinite(np.asarray(t_f)).all()
            assert c[-1] < 1e-5, f"seed {seed}: did not converge, {c}"


class TestCalibration:
    def test_end_to_end_recovers_rig(self, rng):
        """Full images -> features -> matches -> tracks -> BA pipeline
        (models/calibration.py) recovers a 1 cm-perturbed rig to < 1.5 mm
        ATE (BASELINE.json config 4)."""
        from stereovisionarray_tpu.config import SfMConfig
        from stereovisionarray_tpu.datasets.synthetic import (
            reference_rig,
            render_camera_array,
        )
        from stereovisionarray_tpu.models.calibration import calibrate_array

        res = (180, 240)
        rig = reference_rig(
            rows=3, cols=3, spacing=0.05, origin=(-0.05, -0.05), resolution=res
        )
        imgs, _ = render_camera_array(rig, res)
        t_bad = np.asarray(rig.t).copy()
        t_bad[1:] += rng.normal(0, 0.01, t_bad[1:].shape).astype(np.float32)
        init = make_camera_array(
            rig.fx, rig.fy, rig.cx, rig.cy, np.asarray(rig.R), t_bad
        )
        cfg = SfMConfig(max_features=512, ba_iterations=30, ba_damping=1e-3)
        out = calibrate_array(jnp.asarray(imgs), init, 4, cfg, rounds=2)
        ate0 = float(
            absolute_trajectory_error(init.centers, rig.centers, align_scale=True)
        )
        ate1 = float(
            absolute_trajectory_error(
                out.cameras.centers, rig.centers, align_scale=True
            )
        )
        assert ate1 < 0.0015, f"calibration ATE {ate1}"
        assert ate1 < ate0 / 4
        assert int(out.num_obs) > 500

    def test_distortion_aware_calibration(self):
        """STRONG lens distortion (k1 = -0.4): the pre-BA vertical-parallax
        solve recovers k1 and cuts calibration ATE several-fold vs the
        distortion-blind run. (At MODERATE distortion, free structure
        absorbs the lens almost exactly — blind calibration is already
        unhurt there, measured: blind ATE 0.74 mm at k1 = -0.15 vs 0.83 mm
        clean — so the strong regime is where the estimator earns its
        keep.) Own rng: margin assertions must not depend on suite order."""
        from stereovisionarray_tpu.config import SfMConfig
        from stereovisionarray_tpu.datasets.synthetic import (
            reference_rig,
            render_camera_array,
        )
        from stereovisionarray_tpu.geometry.distortion import Distortion, distort_image
        from stereovisionarray_tpu.models.calibration import calibrate_array

        rng = np.random.default_rng(11)
        res = (180, 240)
        k_true = Distortion(k1=-0.4, k2=0.03)
        rig = reference_rig(
            rows=3, cols=3, spacing=0.05, origin=(-0.05, -0.05), resolution=res
        )
        imgs, _ = render_camera_array(rig, res)
        dimgs = jnp.stack([
            distort_image(jnp.asarray(imgs[i]), rig[i], k_true)[0]
            for i in range(len(rig))
        ])
        t_bad = np.asarray(rig.t).copy()
        t_bad[1:] += rng.normal(0, 0.005, t_bad[1:].shape).astype(np.float32)
        init = make_camera_array(
            rig.fx, rig.fy, rig.cx, rig.cy, np.asarray(rig.R), t_bad
        )
        cfg = SfMConfig(max_features=512, ba_iterations=30, ba_damping=1e-3)
        blind = calibrate_array(dimgs, init, 4, cfg, rounds=2)
        aware = calibrate_array(dimgs, init, 4, cfg, rounds=2,
                                estimate_distortion=True)
        k1 = float(aware.distortion[0])
        k2 = float(aware.distortion[1])
        # k1 recovered; k2 is weakly identifiable at this FOV (it trades
        # off against k1 — the undistortion PROFILE stays sub-pixel over
        # the observed radii, which is what the pipeline consumes)
        assert abs(k1 - k_true.k1) < 0.06, (k1, k2)
        assert float(aware.inlier_reproj) < 0.7 * float(blind.inlier_reproj)
        ate_blind = float(absolute_trajectory_error(
            blind.cameras.centers, rig.centers, align_scale=True))
        ate_aware = float(absolute_trajectory_error(
            aware.cameras.centers, rig.centers, align_scale=True))
        assert ate_aware < 0.5 * ate_blind, (ate_aware, ate_blind)
        assert ate_aware < 0.001, f"ATE {ate_aware}"

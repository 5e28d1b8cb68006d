"""Multi-view depth fusion tests: geometric consistency filtering,
deduplication, averaging, and normals against the analytic synthetic scene
(exact GT depth for every view — the `idealRef.yml` pattern generalized)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereovisionarray_tpu.datasets.synthetic import SceneSpec, reference_rig, render_camera_array
from stereovisionarray_tpu.models.fusion import (
    FusionResult,
    depth_normals,
    fuse_depth_maps,
    fused_point_cloud,
)

RES = (48, 64)


@pytest.fixture(scope="module")
def rig():
    cams = reference_rig(rows=3, cols=3, spacing=0.05, resolution=RES)
    _, depths = render_camera_array(cams, RES, SceneSpec())
    return cams, jnp.asarray(depths)


class TestFusion:
    def test_gt_depths_fuse_losslessly(self, rig):
        cams, depths = rig
        res = fuse_depth_maps(cams, depths, rel_thresh=0.01, min_support=3)
        n, h, w = depths.shape
        # every surviving fused depth stays within the agreement tolerance
        # of its own GT (averaging over agreeing exact estimates)
        kept = np.asarray(res.valid)
        fused = np.asarray(res.depth)
        gt = np.asarray(depths)
        rel = np.abs(fused[kept] - gt[kept]) / gt[kept]
        assert rel.max() < 0.01
        # fusion of exact inputs should be *much* tighter than the tolerance
        assert np.median(rel) < 1e-3
        # view 0 wins ownership of everything it sees: nearly all its valid
        # pixels survive; later views keep only disocclusions
        assert kept[0].mean() > 0.9
        assert kept.reshape(n, -1).mean() < 0.45  # dedup culled most copies

    def test_support_counts_views(self, rig):
        cams, depths = rig
        res = fuse_depth_maps(cams, depths, min_support=2, dedup=False)
        sup = np.asarray(res.support)
        # interior pixels of the background plane are seen by all 9 views
        assert sup.max() == len(cams)
        assert np.asarray(res.confidence).max() <= 1.0
        # most pixels have broad support with exact GT depth
        assert (sup >= 5).mean() > 0.7

    def test_corrupt_view_is_rejected(self, rig):
        cams, depths = rig
        bad = depths.at[4].multiply(1.3)  # center view depth off by 30%
        res = fuse_depth_maps(cams, bad, min_support=3, dedup=False)
        kept = np.asarray(res.valid)
        # the corrupted view finds no agreement anywhere
        assert kept[4].mean() < 0.02
        # the other views keep fusing (they lost only one supporter)
        others = np.delete(np.arange(len(cams)), 4)
        assert kept[others].mean() > 0.8
        # and their fused depths are NOT polluted by the corrupt view
        fused = np.asarray(res.depth)
        gt = np.asarray(depths)
        ok = kept[others]
        rel = np.abs(fused[others][ok] - gt[others][ok]) / gt[others][ok]
        assert rel.max() < 0.01

    def test_min_support_monotone(self, rig):
        cams, depths = rig
        counts = []
        for ms in (2, 5, 9):
            res = fuse_depth_maps(cams, depths, min_support=ms, dedup=False)
            counts.append(int(np.asarray(res.valid).sum()))
        assert counts[0] >= counts[1] >= counts[2]
        assert counts[2] > 0

    def test_dedup_unique_ownership(self, rig):
        cams, depths = rig
        full = fuse_depth_maps(cams, depths, min_support=3, dedup=False)
        dd = fuse_depth_maps(cams, depths, min_support=3, dedup=True)
        n_full = int(np.asarray(full.valid).sum())
        n_dd = int(np.asarray(dd.valid).sum())
        h, w = RES
        assert n_dd < n_full
        # deduped cloud is on the order of ONE view's pixel count (plus
        # disocclusion fringes), not N views' worth
        assert n_dd < 2.0 * h * w
        assert n_dd > 0.8 * h * w

    def test_fused_point_cloud_flattens(self, rig):
        cams, depths = rig
        res = fuse_depth_maps(cams, depths, min_support=3)
        pts, conf, col = fused_point_cloud(res)
        assert pts.shape == (int(np.asarray(res.valid).sum()), 3)
        assert conf.shape == (pts.shape[0],)
        assert col is None
        # points live inside the scene's world bounds
        assert np.all(pts[:, 2] > 0.05) and np.all(pts[:, 2] < 0.3)
        colors = jnp.ones(res.valid.shape)
        _, _, col2 = fused_point_cloud(res, colors)
        assert col2.shape == conf.shape

    def test_invalid_mask_respected(self, rig):
        cams, depths = rig
        valid = jnp.ones(depths.shape, bool).at[:, :, :10].set(False)
        res = fuse_depth_maps(cams, depths, valid=valid, min_support=2)
        assert not np.asarray(res.valid)[:, :, :10].any()


class TestReconstruct:
    def test_reconstruct_array_end_to_end(self):
        """Estimated (not GT) depths from the real pipeline fuse into a
        cloud that agrees with the analytic scene."""
        from stereovisionarray_tpu.config import EngineConfig
        from stereovisionarray_tpu.models.fusion import reconstruct_array

        res = (48, 64)
        cams = reference_rig(rows=3, cols=3, spacing=0.05, resolution=res)
        images, gt_depths = render_camera_array(cams, res, SceneSpec())
        cfg = EngineConfig().override(**{
            "camera.rows": 3, "camera.cols": 3,
            "plane_sweep.num_planes": 48,
            "plane_sweep.topology": "to_center",
            "plane_sweep.patch": 5,
            "refine.radius": 2, "refine.window": 9,
            "sgm.num_paths": 4,
        })
        views = (3, 4, 5)
        result, depths = reconstruct_array(
            images, cams, cfg, view_indices=views,
            rel_thresh=0.02, min_support=2,
        )
        assert depths.shape == (3, *res)
        kept = np.asarray(result.valid)
        assert kept.sum() > 0.5 * res[0] * res[1]  # a real cloud survives
        # fused depths agree with GT where kept (interior, pooled over the
        # views: dedup hands nearly all pixels to the first view, leaving
        # later views only the disocclusion fringes)
        inner = np.zeros(res, bool)
        inner[8:-8, 8:-8] = True
        sel = kept & inner[None]
        gt_sel = np.stack([gt_depths[v] for v in views])[sel]
        rel = np.abs(np.asarray(result.depth)[sel] - gt_sel) / gt_sel
        assert np.median(rel) < 0.02
        assert np.percentile(rel, 90) < 0.05
        # estimation noise must not survive below min_support: every kept
        # pixel has at least one independent agreeing view
        assert np.asarray(result.support)[kept].min() >= 2

    def test_min_confidence_gates_points(self):
        """The PKRN gate composes with the geometric filter: a high
        threshold keeps fewer points and does not hurt accuracy."""
        from stereovisionarray_tpu.config import EngineConfig
        from stereovisionarray_tpu.models.fusion import reconstruct_array

        res = (48, 64)
        cams = reference_rig(rows=3, cols=3, spacing=0.05, resolution=res)
        images, gt_depths = render_camera_array(cams, res, SceneSpec())
        cfg = EngineConfig().override(**{
            "camera.rows": 3, "camera.cols": 3,
            "plane_sweep.num_planes": 48,
            "plane_sweep.topology": "to_center",
            "plane_sweep.patch": 5,
            "refine.radius": 2, "refine.window": 9,
            "sgm.num_paths": 4,
        })
        kw = dict(view_indices=(3, 4, 5), rel_thresh=0.02, min_support=2)
        base, _ = reconstruct_array(images, cams, cfg, **kw)
        gated, _ = reconstruct_array(images, cams, cfg, min_confidence=0.6, **kw)
        n_base = int(np.asarray(base.valid).sum())
        n_gated = int(np.asarray(gated.valid).sum())
        assert 0 < n_gated < n_base
        sel = np.asarray(gated.valid)[1]
        rel = np.abs(np.asarray(gated.depth)[1][sel] - gt_depths[4][sel]) / gt_depths[4][sel]
        if sel.sum() > 50:
            assert np.median(rel) < 0.02


class TestNormals:
    def test_plane_normals_face_camera(self, rig):
        cams, depths = rig
        nrm, ok = depth_normals(cams[0], depths[0])
        nrm = np.asarray(nrm)
        ok = np.asarray(ok)
        assert ok[2:-2, 2:-2].all()
        # background plane (z = const) normals point back toward the rig
        # (rig at z=-0.75 looking +z): expect (0, 0, -1) where depth is the
        # background; corners of the image are background in this scene
        corner = nrm[3:8, 3:8]
        assert np.allclose(corner[..., 2], -1.0, atol=1e-3)
        # unit length everywhere valid
        mag = np.linalg.norm(nrm[ok], axis=-1)
        assert np.allclose(mag, 1.0, atol=1e-4)

    def test_sphere_normals_radial(self):
        # dedicated scene: a big sphere so it covers many pixels at test res
        scene = SceneSpec(patches=(), sphere_center=(0.0, 0.0, 0.15), sphere_radius=0.12)
        cams = reference_rig(rows=1, cols=1, origin=(0.0, 0.0), resolution=RES)
        _, depths = render_camera_array(cams, RES, scene)
        depths = jnp.asarray(depths)
        nrm, ok = depth_normals(cams[0], depths[0])
        # find sphere pixels: backproject and test distance to center
        from stereovisionarray_tpu.models.fusion import _pixel_grid

        h, w = RES
        pts = np.asarray(
            cams[0].backproject(_pixel_grid(h, w), depths[0].reshape(-1))
        ).reshape(h, w, 3)
        c = np.asarray(scene.sphere_center)
        r = scene.sphere_radius
        on_sphere = (np.abs(np.linalg.norm(pts - c, axis=-1) - r) < 1e-3) & np.asarray(ok)
        # erode: central differences straddle the silhouette; keep pixels
        # whose 4-neighbourhood is also on the sphere
        m = on_sphere.copy()
        m[1:-1, 1:-1] = (
            on_sphere[1:-1, 1:-1]
            & on_sphere[:-2, 1:-1] & on_sphere[2:, 1:-1]
            & on_sphere[1:-1, :-2] & on_sphere[1:-1, 2:]
        )
        m[0, :] = m[-1, :] = False
        m[:, 0] = m[:, -1] = False
        assert m.sum() > 10
        radial = (pts - c) / np.maximum(np.linalg.norm(pts - c, axis=-1, keepdims=True), 1e-9)
        dots = np.sum(np.asarray(nrm)[m] * radial[m], axis=-1)
        assert dots.mean() > 0.98

"""General (rotated) rig coverage: the reference supports ONLY
fronto-parallel translation grids (`/root/reference/src/Camera.cpp:15-33`);
this framework claims the full R|t pinhole model with the reference as the
R = I special case. These tests drive the claim end-to-end on an
inward-looking camera arc: plane sweep through the general homography path,
and multi-view fusion of rotated-view depth maps."""

import numpy as np
import jax.numpy as jnp
import pytest

from stereovisionarray_tpu.datasets.synthetic import SceneSpec, render_view
from stereovisionarray_tpu.geometry.camera import (
    CameraArray,
    look_at_rotation,
    make_camera_array,
)

RES = (48, 64)


def _arc_rig(n=4, span=0.18, target=(0.0, 0.0, 0.2)):
    """n cameras on a horizontal line at z=-0.75, each ROTATED to look at
    `target` (up to ~13 deg of yaw — far outside the reference's model)."""
    h, w = RES
    f_px = (0.05 / (0.036 / w))
    xs = np.linspace(-span / 2, span / 2, n)
    Rs, ts = [], []
    for x in xs:
        eye = np.array([x, 0.0, -0.75], np.float32)
        R = np.asarray(look_at_rotation(eye, np.asarray(target, np.float32)))
        Rs.append(R)
        ts.append(-R @ eye)  # t = -R C
    n_ = len(xs)
    return make_camera_array(
        np.full(n_, f_px), np.full(n_, f_px),
        np.full(n_, w / 2.0), np.full(n_, h / 2.0),
        np.stack(Rs), np.stack(ts),
    )


@pytest.fixture(scope="module")
def rig():
    cams = _arc_rig()
    scene = SceneSpec()
    imgs, deps = [], []
    for i in range(len(cams)):
        img, dep = render_view(cams, i, RES, scene)
        imgs.append(img)
        deps.append(dep)
    return cams, jnp.asarray(np.stack(imgs)), np.stack(deps)


def test_rig_is_actually_rotated(rig):
    cams, _, _ = rig
    R = np.asarray(cams.R)
    # outermost cameras yaw by several degrees
    ang = np.degrees(np.arccos(np.clip(R[0, 2, 2], -1, 1)))
    assert ang > 5.0
    assert not np.allclose(R[0], np.eye(3), atol=1e-3)


def test_plane_sweep_general_homography_path(rig):
    """plane_sweep_depth with shift_pad=0 routes every (view, plane) through
    fronto_plane_homography + homography_warp — the general-rig path the
    reference cannot express. Depth must land on the analytic scene."""
    from stereovisionarray_tpu.config import PlaneSweepConfig, SGMConfig
    from stereovisionarray_tpu.models.plane_sweep import plane_sweep_depth

    cams, images, gt = rig
    # depth is CAMERA-frame z: rig at z=-0.75, scene at world z 0.10-0.25
    cfg = PlaneSweepConfig(num_planes=64, patch=5, z_near=0.8, z_far=1.1,
                           topology="CROSS")
    out = plane_sweep_depth(
        images, cams, 1, (0, 2, 3), cfg,
        sgm_cfg=SGMConfig(p1=4.0, p2=32.0, num_paths=4),
        backend="xla",
    )
    valid = np.asarray(out.valid)
    inner = np.zeros(RES, bool)
    inner[8:-8, 8:-8] = True
    sel = valid & inner
    assert sel.sum() > 0.8 * inner.sum()
    rel = np.abs(np.asarray(out.depth) - gt[1])[sel] / gt[1][sel]
    assert np.median(rel) < 0.02, f"median rel {np.median(rel)}"


def test_fusion_on_rotated_rig(rig):
    """fuse_depth_maps is camera-model-agnostic: GT depths from rotated
    views must cross-validate (high support) and fuse losslessly."""
    from stereovisionarray_tpu.models.fusion import fuse_depth_maps

    cams, _, gt = rig
    res = fuse_depth_maps(cams, jnp.asarray(gt), rel_thresh=0.01,
                          min_support=2, dedup=False)
    kept = np.asarray(res.valid)
    assert kept.mean() > 0.8  # rotated views still agree on the surface
    rel = np.abs(np.asarray(res.depth) - gt)[kept] / gt[kept]
    assert np.median(rel) < 1e-3
    # the corrupt-view rejection also holds under rotation
    bad = jnp.asarray(gt).at[0].multiply(1.25)
    res_bad = fuse_depth_maps(cams, bad, rel_thresh=0.01, min_support=2,
                              dedup=False)
    assert np.asarray(res_bad.valid)[0].mean() < 0.05


def test_normals_on_rotated_view(rig):
    """depth_normals backprojects through the rotated camera: background
    plane normals must still read (0, 0, -1) in WORLD space (the plane is
    world-axis-aligned even though the image is not)."""
    from stereovisionarray_tpu.models.fusion import depth_normals

    cams, _, gt = rig
    nrm, ok = depth_normals(cams[0], jnp.asarray(gt[0]))
    nrm = np.asarray(nrm)
    # image corners see the background plane
    corner = nrm[3:8, 3:8]
    assert np.asarray(ok)[3:8, 3:8].all()
    assert np.allclose(corner[..., 2], -1.0, atol=2e-3), corner[..., 2]

"""Stereo rectification for general calibrated pairs (geometry/rectify.py)."""

import numpy as np
import jax.numpy as jnp

from stereovisionarray_tpu.geometry import make_camera_array, look_at_rotation
from stereovisionarray_tpu.geometry.rectify import (
    rectified_disparity_to_depth,
    rectify_pair,
)


def _verged_pair(baseline=0.2, depth=2.0, res=(240, 320)):
    """Two cameras toeing in toward a common target — nonzero relative
    rotation, the case the reference cannot represent."""
    h, w = res
    eyes = np.asarray([[-baseline / 2, 0.0, 0.0], [baseline / 2, 0.0, 0.0]])
    target = np.asarray([0.0, 0.0, depth])
    R = np.stack([np.asarray(look_at_rotation(e, target)) for e in eyes])
    t = np.einsum("nij,nj->ni", R, -eyes)
    fx = np.full(2, 300.0)
    cams = make_camera_array(
        jnp.asarray(fx), jnp.asarray(fx),
        jnp.asarray(np.full(2, w / 2.0)), jnp.asarray(np.full(2, h / 2.0)),
        jnp.asarray(R.astype(np.float32)), jnp.asarray(t.astype(np.float32)),
    )
    return cams


def _apply_h(H, uv):
    p = np.concatenate([uv, np.ones((len(uv), 1))], axis=1) @ np.asarray(H).T
    return p[:, :2] / p[:, 2:3]


def test_rows_align_after_rectification():
    cams = _verged_pair()
    rect = rectify_pair(cams, 0, 1)
    rng = np.random.default_rng(0)
    pts = np.stack([
        rng.uniform(-0.4, 0.4, 40),
        rng.uniform(-0.3, 0.3, 40),
        rng.uniform(1.5, 3.0, 40),
    ], axis=-1).astype(np.float32)

    uv_l, _ = cams[0].project(jnp.asarray(pts))
    uv_r, _ = cams[1].project(jnp.asarray(pts))
    # original projections differ in row (verged geometry)
    v_diff_orig = np.abs(np.asarray(uv_l)[:, 1] - np.asarray(uv_r)[:, 1])
    assert v_diff_orig.max() > 0.5

    # rectified pixel = H⁻¹ (new->old is H, so old->new is inv(H))
    Hl_inv = np.linalg.inv(np.asarray(rect.H_left))
    Hr_inv = np.linalg.inv(np.asarray(rect.H_right))
    rl = _apply_h(Hl_inv, np.asarray(uv_l))
    rr = _apply_h(Hr_inv, np.asarray(uv_r))
    v_diff = np.abs(rl[:, 1] - rr[:, 1])
    assert v_diff.max() < 1e-2  # rows align to sub-hundredth pixel


def test_disparity_positive_and_depth_consistent():
    cams = _verged_pair()
    rect = rectify_pair(cams, 0, 1)
    rng = np.random.default_rng(1)
    pts = np.stack([
        rng.uniform(-0.3, 0.3, 30),
        rng.uniform(-0.2, 0.2, 30),
        rng.uniform(1.5, 3.0, 30),
    ], axis=-1).astype(np.float32)
    uv_l, _ = cams[0].project(jnp.asarray(pts))
    uv_r, _ = cams[1].project(jnp.asarray(pts))
    rl = _apply_h(np.linalg.inv(np.asarray(rect.H_left)), np.asarray(uv_l))
    rr = _apply_h(np.linalg.inv(np.asarray(rect.H_right)), np.asarray(uv_r))
    disp = rl[:, 0] - rr[:, 0]
    assert (disp > 0).all()  # left camera sees points shifted right

    depth = np.asarray(
        rectified_disparity_to_depth(jnp.asarray(disp.astype(np.float32)), rect)
    )
    # compare against depth along the rectified z axis
    R_new = np.asarray(rect.R_new)
    c_l = np.asarray(cams.centers)[0]
    z_rect = (pts - c_l) @ R_new[2]
    np.testing.assert_allclose(depth, z_rect, rtol=1e-3)


def test_identity_for_already_rectified_rig():
    """A translation-only pair is already rectified: the homographies must
    be (near) pure 2D similarity with no vertical disparity introduced."""
    from stereovisionarray_tpu.datasets import reference_rig

    cams = reference_rig(rows=1, cols=2, spacing=0.1, resolution=(100, 140))
    rect = rectify_pair(cams, 0, 1)
    rng = np.random.default_rng(2)
    uv = rng.uniform(10, 90, size=(20, 2)).astype(np.float32)
    out_l = _apply_h(np.linalg.inv(np.asarray(rect.H_left)), uv)
    out_r = _apply_h(np.linalg.inv(np.asarray(rect.H_right)), uv)
    np.testing.assert_allclose(out_l, uv, atol=1e-3)
    np.testing.assert_allclose(out_r, uv, atol=1e-3)


def test_rectified_sgm_end_to_end():
    """Render a VERGED pair (rotation the reference cannot express), rectify
    the images, run the rectified SGM engine, and recover metric depth."""
    from stereovisionarray_tpu.config import CostConfig, SGMConfig
    from stereovisionarray_tpu.datasets.synthetic import SceneSpec, render_view
    from stereovisionarray_tpu.geometry.rectify import rectify_images
    from stereovisionarray_tpu.models import two_view_disparity

    h, w = 96, 128
    eyes = np.asarray([[-0.05, 0, 0], [0.05, 0, 0]])
    target = np.asarray([0.0, 0.0, 0.8])
    R = np.stack([np.asarray(look_at_rotation(e, target)) for e in eyes]).astype(np.float32)
    t = np.einsum("nij,nj->ni", R, -eyes).astype(np.float32)
    fx = np.full(2, 160.0, np.float32)
    cams = make_camera_array(
        jnp.asarray(fx), jnp.asarray(fx),
        jnp.asarray(np.full(2, w / 2, np.float32)),
        jnp.asarray(np.full(2, h / 2, np.float32)),
        jnp.asarray(R), jnp.asarray(t),
    )
    imgL, _ = render_view(cams, 0, (h, w), SceneSpec())
    imgR, _ = render_view(cams, 1, (h, w), SceneSpec())
    rect = rectify_pair(cams, 0, 1)
    lw, lv, rw, _ = rectify_images(jnp.asarray(imgL), jnp.asarray(imgR), rect)
    out = two_view_disparity(
        lw, rw, CostConfig(num_disparities=32, census_window=(5, 5)),
        SGMConfig(num_paths=4),
    )
    depth = np.asarray(rectified_disparity_to_depth(out.disparity, rect))
    valid = np.asarray(out.valid) & np.asarray(lv) & (depth > 0)
    sel = valid.copy()
    sel[:12] = False
    sel[-12:] = False
    sel[:, :40] = False  # no-overlap band: x < max disparity
    sel[:, -12:] = False
    assert sel.mean() > 0.1
    med = np.median(depth[sel])
    assert 0.7 < med < 0.9  # scene surfaces sit around z = 0.75-0.85

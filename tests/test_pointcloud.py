"""Point-cloud ⇄ depth-map converters (geometry/pointcloud.py) + PLY I/O.

Covers the reference's `DepthMapToPoints3D` / `Points3DToDepthMap` round trip
(``/root/reference/src/functions.cpp:118-146``), plus the z-buffer semantics
the reference lacks.
"""

import numpy as np
import jax.numpy as jnp

from stereovisionarray_tpu.geometry import (
    depth_map_to_points,
    points_to_depth_map,
    point_cloud_colors,
    translation_only_array,
)
from stereovisionarray_tpu.datasets import save_ply, load_ply


def _cam(res=(32, 40)):
    pos = np.zeros((1, 3), dtype=np.float32)
    pos[0, 2] = -0.75
    return translation_only_array(0.05, pos, 1e-4, resolution=(res[1], res[0]))[0]


def test_depth_points_round_trip():
    cam = _cam()
    h, w = 32, 40
    rng = np.random.default_rng(3)
    depth = jnp.asarray(rng.uniform(0.5, 1.0, size=(h, w)).astype(np.float32))
    pts, valid = depth_map_to_points(cam, depth)
    assert bool(valid.all())
    back = points_to_depth_map(cam, pts.reshape(-1, 3), (h, w))
    # every pixel's point projects back to itself -> depth map reproduced
    np.testing.assert_allclose(np.asarray(back), np.asarray(depth), rtol=1e-4)


def test_points_to_depth_z_buffer_nearest_wins():
    cam = _cam()
    h, w = 32, 40
    # two points along the same ray: center pixel, depths 0.6 and 0.9
    uv = jnp.asarray([[w / 2.0, h / 2.0], [w / 2.0, h / 2.0]], dtype=jnp.float32)
    pts = cam.backproject(uv, jnp.asarray([0.9, 0.6], dtype=jnp.float32))
    d = points_to_depth_map(cam, pts, (h, w))
    landed = np.asarray(d)
    assert np.isclose(landed.max(), 0.6, rtol=1e-4)  # nearest wins, not last


def test_points_to_depth_ignores_invalid_and_oob():
    cam = _cam()
    h, w = 16, 16
    pts = jnp.asarray(
        [[0.0, 0.0, 0.2], [100.0, 100.0, 0.2], [0.0, 0.0, -2.0]], dtype=jnp.float32
    )
    valid = jnp.asarray([False, True, True])
    d = points_to_depth_map(cam, pts, (h, w), valid=valid, fill=-1.0)
    assert float(np.asarray(d).max()) == -1.0  # all filtered -> all fill


def test_masked_backprojection():
    cam = _cam()
    h, w = 32, 40
    depth = jnp.full((h, w), 0.7, dtype=jnp.float32)
    mask = jnp.zeros((h, w), dtype=bool).at[4:8, 4:8].set(True)
    _, valid = depth_map_to_points(cam, depth, mask=mask)
    assert int(valid.sum()) == 16


def test_ply_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    col = rng.integers(0, 255, size=(50, 3)).astype(np.uint8)
    keep = rng.random(50) > 0.4
    p = str(tmp_path / "cloud.ply")
    n = save_ply(p, pts, colors=col, valid=keep)
    assert n == int(keep.sum())
    pts2, col2 = load_ply(p)
    np.testing.assert_array_equal(pts2, pts[keep])
    np.testing.assert_array_equal(col2, col[keep])


def test_point_cloud_colors_gray_broadcast():
    img = jnp.full((4, 4), 128.0)
    valid = jnp.ones((4, 4), dtype=bool).at[0, 0].set(False)
    c = point_cloud_colors(img, valid)
    assert c.shape == (16, 3) and c.dtype == jnp.uint8
    assert int(c[0].sum()) == 0 and int(c[1, 0]) == 128

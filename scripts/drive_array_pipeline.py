"""Drive the end-to-end array pipeline (models/array_pipeline.py) on CPU:
synthetic 3x3 rig -> plane-sweep depth -> multi-view refinement -> point
cloud export. The `main()`-parity path of the reference
(``/root/reference/src/CameraStereoVision.cpp:10-123``)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from stereovisionarray_tpu.config import EngineConfig
from stereovisionarray_tpu.datasets import (
    SceneSpec,
    reference_rig,
    render_camera_array,
    save_ply,
)
from stereovisionarray_tpu.geometry import depth_map_to_points, point_cloud_colors
from stereovisionarray_tpu.models import array_depth_pipeline


def main():
    rows = cols = 3
    res = (72, 96)
    cams = reference_rig(rows=rows, cols=cols, spacing=0.05, resolution=res)
    images, depths = render_camera_array(cams, res, SceneSpec())
    cfg = EngineConfig().override(**{
        "camera.rows": rows,
        "camera.cols": cols,
        "plane_sweep.num_planes": 64,
        "refine.radius": 2,
        "refine.window": 9,
    })
    out = array_depth_pipeline(jnp.asarray(images), cams, cfg, ref_index=4)
    gt = depths[4]
    valid = np.asarray(out.valid)
    inner = np.zeros_like(valid)
    inner[10:-10, 10:-10] = True
    sel = valid & inner
    rerr = (np.abs(np.asarray(out.depth)) - gt)[sel] / gt[sel]
    rerr_ref = (np.abs(np.asarray(out.refined_depth)) - gt)[sel] / gt[sel]
    print(f"array pipeline: median rel err={np.median(np.abs(rerr)):.4f} "
          f"refined={np.median(np.abs(rerr_ref)):.4f} valid={sel.sum()/inner.sum():.3f}")
    assert np.median(np.abs(rerr)) < 0.02
    assert np.median(np.abs(rerr_ref)) < 0.03
    assert sel.sum() > 0.9 * inner.sum()

    # point-cloud export round trip
    pts, pvalid = depth_map_to_points(cams[4], out.refined_depth, mask=out.valid)
    col = point_cloud_colors(jnp.asarray(images[4]), pvalid)
    n = save_ply("/tmp/array_cloud.ply", np.asarray(pts).reshape(-1, 3), colors=np.asarray(col),
                 valid=np.asarray(pvalid).reshape(-1))
    print(f"point cloud: {n} points exported")
    assert n == int(np.asarray(pvalid).sum()) and n > 1000

    # ROI-gated run stays finite and respects the gate
    out2 = array_depth_pipeline(jnp.asarray(images), cams, cfg, ref_index=4, use_roi=True)
    assert np.isfinite(np.asarray(out2.refined_depth)).all()
    print("ARRAY PIPELINE DRIVE OK")


if __name__ == "__main__":
    main()

"""Drive the reconstruction surface end-to-end on CPU: synthetic array ->
per-view pipeline depths -> geometric-consistency fusion -> confidence gate
-> outlier removal -> voxel downsample -> PLY bytes. The fusion counterpart
of drive_two_view/drive_array_pipeline (verify-skill recipe)."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from stereovisionarray_tpu.config import EngineConfig
from stereovisionarray_tpu.datasets import SceneSpec, reference_rig, render_camera_array, save_ply
from stereovisionarray_tpu.geometry import remove_outliers, voxel_downsample
from stereovisionarray_tpu.models.fusion import fused_point_cloud, reconstruct_array

res = (48, 64)
cams = reference_rig(rows=3, cols=3, spacing=0.05, resolution=res)
images, gt = render_camera_array(cams, res, SceneSpec())
cfg = EngineConfig().override(**{
    "camera.rows": 3, "camera.cols": 3,
    "plane_sweep.num_planes": 48, "plane_sweep.topology": "to_center",
    "plane_sweep.patch": 5, "refine.radius": 2, "refine.window": 9,
    "sgm.num_paths": 4,
})
views = (3, 4, 5)
result, depths = reconstruct_array(
    jnp.asarray(images), cams, cfg, view_indices=views,
    rel_thresh=0.02, min_support=2, min_confidence=0.2,
)
kept = np.asarray(result.valid)
assert kept.sum() > 0.5 * res[0] * res[1], kept.sum()
sel = kept & np.asarray(result.depth > 0)
gt_sel = np.stack([gt[v] for v in views])
rel = np.abs(np.asarray(result.depth) - gt_sel)[sel] / gt_sel[sel]
assert np.median(rel) < 0.02, np.median(rel)
print(f"fusion: {int(kept.sum())} pts, median rel err {np.median(rel):.4f}")

pts, conf, _ = fused_point_cloud(result)
keep = remove_outliers(pts, voxel=0.01, min_neighbors=2)
pts2, w2, _ = voxel_downsample(pts[keep], 0.004, weights=conf[keep])
assert 0 < pts2.shape[0] <= keep.sum()
with tempfile.TemporaryDirectory() as d:
    n = save_ply(os.path.join(d, "c.ply"), pts2)
    assert n == pts2.shape[0]
print(f"postprocess: {pts.shape[0]} -> {int(keep.sum())} -> {pts2.shape[0]} pts")
print("FUSION DRIVE OK")

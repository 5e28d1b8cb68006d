"""Emit EVAL_FUSION_r{N}.json — accuracy/completeness of the multi-view
fusion stage (models/fusion.py): every view of the 5x5 rig gets its own
plane-sweep + refine depth, geometric-consistency fusion merges them into
one deduplicated cloud, and the cloud is scored against the exact ray-traced
ground truth.

Metrics:
  - accuracy: relative depth error of kept points vs their own view's GT
    (median / p90), plus the same split by support level (does the
    confidence signal actually rank reliability?);
  - completeness: re-render the fused cloud into the center camera with the
    z-buffered splat (`points_to_depth_map`) and measure the fraction of
    center-view GT pixels reproduced within 2% depth;
  - dedup efficiency: fused points vs the sum of per-view valid pixels.

Usage: python scripts/make_fusion_eval.py [--out EVAL_FUSION_r04.json]
Runs on CPU (forced) — accuracy is backend-independent.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from stereovisionarray_tpu.config import EngineConfig
from stereovisionarray_tpu.datasets import SceneSpec, reference_rig, render_camera_array
from stereovisionarray_tpu.geometry import points_to_depth_map
from stereovisionarray_tpu.models.fusion import fuse_depth_maps, reconstruct_array


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="EVAL_FUSION_r04.json")
    args = ap.parse_args()

    rows = cols = 5
    res = (135, 180)
    cams = reference_rig(rows=rows, cols=cols, spacing=0.05, resolution=res)
    images, gt = render_camera_array(cams, res, SceneSpec())
    cfg = EngineConfig().override(**{
        "camera.rows": rows,
        "camera.cols": cols,
        "plane_sweep.num_planes": 96,
        "plane_sweep.topology": "cross",
        "refine.radius": 2,
    })

    result, depths = reconstruct_array(
        jnp.asarray(images), cams, cfg, rel_thresh=0.01, min_support=3,
    )
    kept = np.asarray(result.valid)
    fused = np.asarray(result.depth)
    support = np.asarray(result.support)

    rel = np.abs(fused - gt) / np.maximum(gt, 1e-9)
    rel_kept = rel[kept]
    per_view_valid = int(np.asarray(depths > 0).sum())
    n_points = int(kept.sum())

    # support-stratified accuracy: higher support must mean lower error
    by_support = {}
    for lo, hi, name in ((3, 5, "support_3_4"), (5, 10, "support_5_9"),
                         (10, 26, "support_10_plus")):
        sel = kept & (support >= lo) & (support < hi)
        if sel.sum() > 100:
            by_support[name] = {
                "points": int(sel.sum()),
                "median_rel_err": round(float(np.median(rel[sel])), 6),
            }

    # completeness: splat the fused cloud into the center camera and compare
    ref_index = (rows // 2) * cols + cols // 2
    pts = np.asarray(result.points).reshape(-1, 3)[kept.reshape(-1)]
    splat = np.asarray(points_to_depth_map(
        cams[ref_index], jnp.asarray(pts), res))
    gt_c = gt[ref_index]
    seen = splat > 0
    agree = seen & (np.abs(splat - gt_c) <= 0.02 * gt_c)
    completeness = float(agree.mean())

    # robustness: corrupt one view's depths by 30% -> fusion must reject it
    bad = jnp.asarray(gt).at[0].multiply(1.3)
    res_bad = fuse_depth_maps(cams, bad, rel_thresh=0.01, min_support=3,
                              dedup=False)
    bad_kept = float(np.asarray(res_bad.valid)[0].mean())

    out = {
        "pipeline": "reconstruct_array (25x plane sweep + refine -> fuse_depth_maps)",
        "rig": f"{rows}x{cols} @ {res[0]}x{res[1]}, 96 planes, CROSS, "
               "rel_thresh=0.01, min_support=3",
        "fixture": "ray-traced synthetic rig, exact GT (datasets.render_camera_array)",
        "points_fused": n_points,
        "per_view_valid_pixels": per_view_valid,
        "dedup_ratio": round(per_view_valid / max(n_points, 1), 2),
        "median_rel_depth_err_fused": round(float(np.median(rel_kept)), 6),
        "p90_rel_depth_err_fused": round(float(np.percentile(rel_kept, 90)), 6),
        "accuracy_by_support": by_support,
        "center_view_completeness_2pct": round(completeness, 4),
        "corrupt_view_survival_rate": round(bad_kept, 6),
        "note": "fused median <= the per-view pipeline medians in "
                "EVAL_ARRAY (consistency averaging); corrupt_view_survival "
                "is the fraction of a 30%-biased view's pixels that survive "
                "fusion (should be ~0).",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

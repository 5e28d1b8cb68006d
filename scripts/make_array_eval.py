"""Emit EVAL_ARRAY_r{N}.json — golden-accuracy numbers for the full camera-
array pipeline (BASELINE.json config 3 + refinement, config 4's refine
stage) on the ray-traced synthetic rig with exact ground truth.

The two-view counterpart is EVAL_r02.json (bad-2.0/EPE on the committed
Middlebury-format fixture); this covers the reference's actual headline
use-case — `main()`'s 5x5 array -> depth -> refine -> masked mean error
(``/root/reference/src/CameraStereoVision.cpp:107-120``,
``/root/reference/src/functions.cpp:348-354``) — with relative-depth-error
medians instead of the reference's unscaled mean (the reference's GT is a
captured YAML with no stated units).

Usage: python scripts/make_array_eval.py [--out EVAL_ARRAY_r02.json]
Runs on CPU (forced) — accuracy is backend-independent (the Pallas path is
bit-exact vs the XLA oracle; tests/test_sgm_pallas.py).
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
from stereovisionarray_tpu.models import array_depth_pipeline


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="EVAL_ARRAY_r02.json")
    args = ap.parse_args()

    rows = cols = 5
    res = (135, 180)  # reference working class at CPU-tractable scale
    cams = reference_rig(rows=rows, cols=cols, spacing=0.05, resolution=res)
    images, depths = render_camera_array(cams, res, SceneSpec())
    ref_index = (rows // 2) * cols + cols // 2
    cfg = EngineConfig().override(**{
        "camera.rows": rows,
        "camera.cols": cols,
        "plane_sweep.num_planes": 96,
        "plane_sweep.topology": "CROSS",
        "refine.radius": 3,
        "refine.window": 11,
    })
    out = array_depth_pipeline(jnp.asarray(images), cams, cfg, ref_index=ref_index)

    gt = depths[ref_index]
    valid = np.asarray(out.valid)
    inner = np.zeros_like(valid)
    inner[8:-8, 8:-8] = True  # drop border bands with no cross-view evidence
    sel = valid & inner
    rerr_sweep = np.abs((np.abs(np.asarray(out.depth)) - gt)[sel] / gt[sel])
    rerr_ref = np.abs((np.abs(np.asarray(out.refined_depth)) - gt)[sel] / gt[sel])

    payload = {
        "pipeline": "array_depth_pipeline (plane sweep + SGM + multiview refine)",
        "rig": f"{rows}x{cols} @ {res[0]}x{res[1]}, {cfg.plane_sweep.num_planes} planes, CROSS",
        "fixture": "ray-traced synthetic rig, exact GT (datasets.render_camera_array)",
        "median_rel_depth_err_sweep": round(float(np.median(rerr_sweep)), 5),
        "median_rel_depth_err_refined": round(float(np.median(rerr_ref)), 5),
        "frac_rel_err_lt_1pct_refined": round(float((rerr_ref < 0.01).mean()), 4),
        "density": round(float(sel.sum() / inner.sum()), 4),
    }

    # cascade variant (models/cascade_sweep.py production defaults) on the
    # same fixture — the EVAL_CASCADE_SWEEP perf artifact's accuracy twin
    out_c = array_depth_pipeline(
        jnp.asarray(images), cams,
        cfg.override(**{"plane_sweep.cascade": True}), ref_index=ref_index,
    )
    valid_c = np.asarray(out_c.valid)
    sel_c = valid_c & inner
    rerr_c = np.abs(
        (np.abs(np.asarray(out_c.refined_depth)) - gt)[sel_c] / gt[sel_c]
    )
    payload["cascade"] = {
        "median_rel_depth_err_refined": round(float(np.median(rerr_c)), 5),
        "frac_rel_err_lt_1pct_refined": round(float((rerr_c < 0.01).mean()), 4),
        "density": round(float(sel_c.sum() / inner.sum()), 4),
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

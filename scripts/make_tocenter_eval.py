"""EVAL_ARRAY_TOCENTER_r05 — what the reference's 24-pair TO_CENTER
topology buys over CROSS, end to end (VERDICT r4 "missing" #2).

TO_CENTER (``/root/reference/src/functions.cpp:150-155``) is the
library's own default (config.py: topology="to_center", topk=6), but
every prior end-to-end artifact overrode to CROSS. This runs the FULL
array pipeline (sweep + SGM + refine) for both topologies across the
EVAL_ROBUST severity ladder (per-view gain/bias + read/shot noise +
defocus): more views should hold accuracy deeper into the noise levels.

CPU (accuracy is backend-independent); the TO_CENTER device throughput
is BENCH_ARRAY_TOCENTER_r05.json (bench_array.py --topology to_center).
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from make_robust_eval import perturb_views

LEVELS = (0, 1, 2, 3)


def array_metrics(level: int, rng, topology: str, cascade: bool) -> dict:
    from stereovisionarray_tpu.config import EngineConfig
    from stereovisionarray_tpu.datasets import (
        SceneSpec, reference_rig, render_camera_array,
    )
    from stereovisionarray_tpu.models import array_depth_pipeline

    rows = cols = 5
    res = (135, 180)
    cams = reference_rig(rows=rows, cols=cols, spacing=0.05, resolution=res)
    images, depths = render_camera_array(cams, res, SceneSpec())
    images = perturb_views(np.asarray(images), level, rng)
    ref_index = (rows // 2) * cols + cols // 2
    cfg = EngineConfig().override(**{
        "camera.rows": rows, "camera.cols": cols,
        "plane_sweep.num_planes": 96,
        "plane_sweep.topology": topology,
        "plane_sweep.cascade": cascade,
        "refine.radius": 3, "refine.window": 11,
    })
    out = array_depth_pipeline(jnp.asarray(images), cams, cfg,
                               ref_index=ref_index)
    gt = depths[ref_index]
    valid = np.asarray(out.valid)
    inner = np.zeros_like(valid)
    inner[8:-8, 8:-8] = True
    sel = valid & inner
    rerr = np.abs((np.abs(np.asarray(out.refined_depth)) - gt)[sel] / gt[sel])
    return {
        "median_rel": round(float(np.median(rerr)), 5),
        "mean_rel": round(float(rerr.mean()), 5),
        "bad2pct": round(float((rerr > 0.02).mean()), 5),
        "density": round(float(sel.sum() / inner.sum()), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="EVAL_ARRAY_TOCENTER_r05.json")
    args = ap.parse_args()
    report = {"shape": [25, 135, 180, 96],
              "protocol": "EVAL_ROBUST severity ladder (gain/bias + "
                          "read/shot noise + defocus), full array pipeline"}
    for topo in ("CROSS", "TO_CENTER"):
        rows = {}
        for level in LEVELS:
            rng = np.random.default_rng(100 + level)
            rows[f"level_{level}"] = array_metrics(level, rng, topo, False)
            print(topo, level, rows[f"level_{level}"], flush=True)
        report[topo.lower()] = rows
    # cascade composition sanity at the default topology, clean level
    rng = np.random.default_rng(100)
    report["to_center_cascade_level0"] = array_metrics(
        0, rng, "TO_CENTER", True)
    print("cascade", report["to_center_cascade_level0"], flush=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report, sort_keys=True))


if __name__ == "__main__":
    main()

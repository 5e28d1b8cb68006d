"""Cascade vs flat plane sweep over the camera array: device time + accuracy.

Measures the claim in ``models/cascade_sweep.py`` at the flagship array
bench config (5x5 views, 270x360, 128 planes, CROSS topology — the
reference's ``main()`` working class,
``/root/reference/src/CameraStereoVision.cpp:10-123``): a coarse pass at
half resolution + a per-pixel banded fine pass vs the flat 128-plane sweep,
both through the full ``array_depth_pipeline`` (sweep + SGM + refine).

Timing follows bench.py's tunnel rules: several frame-sets per jitted
dispatch via lax.map, two-batch-size SLOPE to cancel dispatch latency,
scalar-reduce host fetch fences, salted inputs.

Accuracy: the ray-traced synthetic rig with exact GT (make_array_eval.py's
scene) at the SAME 270x360 scale, scored on the interior for both
pipelines.

Writes EVAL_CASCADE_SWEEP_r04.json.
"""

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)

ROWS = COLS = 5
H, W = 270, 360
PLANES = 128
FINE, STEP, FACTOR = 48, 8, 2


def _timed(fn, x, salt):
    t0 = time.perf_counter()
    float(fn(x + salt))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--repeats", type=int, default=9)
    ap.add_argument("--batches", type=int, nargs=2, default=[1, 3])
    ap.add_argument("--fine", type=int, default=FINE)
    ap.add_argument("--factor", type=int, default=FACTOR)
    ap.add_argument("--out", default="EVAL_CASCADE_SWEEP_r04.json")
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from stereovisionarray_tpu.config import EngineConfig
    from stereovisionarray_tpu.datasets import (
        SceneSpec,
        reference_rig,
        render_camera_array,
    )
    from stereovisionarray_tpu.models import array_depth_pipeline

    cams = reference_rig(rows=ROWS, cols=COLS, spacing=0.05, resolution=(H, W))
    images, depths = render_camera_array(cams, (H, W), SceneSpec())
    base = {
        "camera.rows": ROWS,
        "camera.cols": COLS,
        "plane_sweep.num_planes": PLANES,
        "plane_sweep.topology": "CROSS",
    }
    cfg_flat = EngineConfig().override(**base)
    cfg_casc = EngineConfig().override(**{
        **base,
        "plane_sweep.cascade": True,
        "plane_sweep.cascade_coarse_factor": args.factor,
        "plane_sweep.cascade_fine_planes": args.fine,
        "plane_sweep.cascade_band_step": STEP,
    })

    def batcher(cfg, n):
        @jax.jit
        def run(batched):
            def one(imgs):
                return jnp.sum(array_depth_pipeline(imgs, cams, cfg).refined_depth)

            return jnp.sum(jax.lax.map(one, batched))

        stack = np.stack([images] * n)
        return run, jax.device_put(jnp.asarray(stack))

    nb_s, nb_b = args.batches
    report = {
        "shape": [ROWS * COLS, H, W, PLANES],
        "cascade": {"factor": args.factor, "fine": args.fine, "step": STEP},
    }

    for name, cfg in [("flat", cfg_flat), ("cascade", cfg_casc)]:
        fs, xs = batcher(cfg, nb_s)
        fb, xb = batcher(cfg, nb_b)
        for k in range(3):
            _timed(fs, xs, 0.2 + 0.01 * k)
            _timed(fb, xb, 0.2 + 0.01 * k)
        ts, tb = [], []
        for i in range(args.repeats):
            salt = 1.0 + 0.1 * i
            ts.append(_timed(fs, xs, salt))
            tb.append(_timed(fb, xb, salt + 0.05))
        per = (statistics.median(tb) - statistics.median(ts)) / (nb_b - nb_s)
        report[name + "_ms_per_set"] = round(per * 1e3, 3)
        report[name + "_sustained_ms"] = round(statistics.median(tb) / nb_b * 1e3, 3)
        print(name, report[name + "_ms_per_set"], "ms/set", flush=True)

    if report["cascade_ms_per_set"] > 0 and report["flat_ms_per_set"] > 0:
        report["speedup"] = round(
            report["flat_ms_per_set"] / report["cascade_ms_per_set"], 2
        )

    # ---- accuracy on the exact ray-traced rig ------------------------------
    gt = depths[(ROWS // 2) * COLS + COLS // 2]
    inner = np.zeros((H, W), bool)
    inner[8:-8, 8:-8] = True
    for name, cfg in [("flat", cfg_flat), ("cascade", cfg_casc)]:
        out = array_depth_pipeline(jnp.asarray(images), cams, cfg)
        d, v = np.asarray(out.refined_depth), np.asarray(out.valid)
        sel = v & inner
        rel = np.abs(d[sel] - gt[sel]) / gt[sel]
        report[name + "_eval"] = {
            "valid_inner": round(float(sel.sum() / inner.sum()), 4),
            "median_rel": round(float(np.median(rel)), 6),
            "mean_rel": round(float(rel.mean()), 6),
            "bad2pct": round(float((rel > 0.02).mean()), 5),
        }
        print(name, report[name + "_eval"], flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report, sort_keys=True))


if __name__ == "__main__":
    main()

"""Cascade vs flat plane sweep over the camera array: device time + accuracy.

Measures the claim in ``models/cascade_sweep.py`` at the flagship array
bench config (5x5 views, 270x360, 128 planes, CROSS topology — the
reference's ``main()`` working class,
``/root/reference/src/CameraStereoVision.cpp:10-123``): a coarse pass at
quarter resolution + a per-pixel banded fine pass vs the flat 128-plane
sweep, both through the full ``array_depth_pipeline`` (sweep + SGM +
refine).

Timing: the two-batch slope with a FAT spread — K=4 vs K=12 frame-sets per
jitted lax.map dispatch, scalar-reduce fences, salted inputs, medians —
per-set = (T(12) - T(4)) / 8. The tunnel's per-dispatch latency is ~15-25
ms, comparable to the whole batch's compute at this shape: the original
B=1/3 slope inverted under that jitter (once read the cascade 13% slower),
and K=8 fenced absolutes carry a ~3 ms/set dispatch share that masquerades
as per-call fixed cost (probe_cascade_stages2's D-sweep intercept). The
fat slope cancels dispatch with 3x the spread of B=1/3.

Accuracy: the ray-traced synthetic rig with exact GT (make_array_eval.py's
scene) at the SAME 270x360 scale, scored on the interior for both
pipelines.

Writes EVAL_CASCADE_SWEEP_r05.json.
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
FINE, STEP, FACTOR = 48, 8, 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--repeats", type=int, default=9)
    ap.add_argument("--sets", type=int, nargs=2, default=[4, 12],
                    help="small/big frame-sets per dispatch for the slope")
    ap.add_argument("--fine", type=int, default=FINE)
    ap.add_argument("--factor", type=int, default=FACTOR)
    ap.add_argument("--out", default="EVAL_CASCADE_SWEEP_r05.json")
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

    k_small, k_big = args.sets
    stacks = {
        k: jax.device_put(jnp.asarray(np.stack([images] * k)))
        for k in (k_small, k_big)
    }

    def batcher(cfg):
        @jax.jit
        def run(batched):
            def one(imgs):
                return jnp.sum(array_depth_pipeline(imgs, cams, cfg).refined_depth)

            return jnp.sum(jax.lax.map(one, batched))

        return run

    report = {
        "shape": [ROWS * COLS, H, W, PLANES],
        "method": f"K={k_small}/{k_big} sets/dispatch fat slope "
                  "(dispatch latency cancelled)",
        "cascade": {"factor": args.factor, "fine": args.fine, "step": STEP},
    }

    for name, cfg in [("flat", cfg_flat), ("cascade", cfg_casc)]:
        run = batcher(cfg)
        for k in (k_small, k_big):
            for w in range(3):
                float(run(stacks[k] + 0.1 * w))
        ts, tb = [], []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            float(run(stacks[k_small] + 1.0 + 0.05 * i))
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run(stacks[k_big] + 1.02 + 0.05 * i))
            tb.append(time.perf_counter() - t0)
        per = (statistics.median(tb) - statistics.median(ts)) / (k_big - k_small)
        report[name + "_ms_per_set"] = round(per * 1e3, 3)
        report[name + "_sustained_ms"] = round(
            statistics.median(tb) / k_big * 1e3, 3
        )
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

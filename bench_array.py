"""Array-pipeline benchmark — ONE JSON line (driver-readable; VERDICT r1
item 9: round-over-round perf artifacts instead of README prose).

Measures the full camera-array pipeline of BASELINE.json config 3 at the
reference's working class: 5x5 views, 270x360, 128 sweep planes, CROSS
topology, plane-sweep fusion + SGM + multi-view refinement — the TPU
generalization of the reference's whole `main()`
(``/root/reference/src/CameraStereoVision.cpp:10-123``).

Timing uses the same dispatch-overhead-cancelling slope method as bench.py
(two batch sizes inside one jitted lax.map, fenced by scalar fetch),
reporting frame-sets/second. ``vs_baseline``: the reference processes ONE
frame-set per run, single-threaded, at an estimated >= 60 s/frame-set
(25 views x the two-view hot-loop model in bench.py, ~0.07 MP/s over
0.097 MP per pair + refine) => ~0.016 set/s. vs_baseline = measured/0.016.
"""

import json
import os
import statistics
import time

import numpy as np

REF_EST_SETS_PER_S = 0.016

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")

ROWS = COLS = 5
H, W = 270, 360
PLANES = 128
# fat slope spread: at ~3-7 ms compute/set the tunnel's 15-25 ms dispatch
# latency is comparable to a whole small batch, and the original B=1/3
# slope could invert or halve under jitter (probe_cascade_stages2's
# dispatch-share analysis); 2/8 gives 3x the spread with the same method
B_SMALL, B_BIG = 2, 8
REPEATS = 8
MAX_ROUNDS = 4


def _make(jax, jnp, batch, cascade=False, topology="CROSS"):
    from stereovisionarray_tpu.config import EngineConfig
    from stereovisionarray_tpu.datasets import SceneSpec, reference_rig, render_camera_array
    from stereovisionarray_tpu.models import array_depth_pipeline

    cams = reference_rig(rows=ROWS, cols=COLS, spacing=0.05, resolution=(H, W))
    images, _ = render_camera_array(cams, (H, W), SceneSpec())
    overrides = {
        "camera.rows": ROWS,
        "camera.cols": COLS,
        "plane_sweep.num_planes": PLANES,
        "plane_sweep.topology": topology,
        # sources_8bit (single-arm exact warp for decoded 8-bit frames)
        # measures NEUTRAL here — the kernel is VPU-bound in the hamming
        # and Mosaic already hides the MXU warp under it (within-run A/B
        # 5.08 vs 4.94 ms, scripts/perf_array_stages.py sweep_volume_8bit)
        # — so the bench keeps the r2-comparable default path
    }
    if cascade:
        overrides["plane_sweep.cascade"] = True
        overrides["plane_sweep.cascade_fine_planes"] = 48
    cfg = EngineConfig().override(**overrides)

    stack = np.stack([images] * batch)  # (B, N, H, W)

    @jax.jit
    def run(batched_images):
        def one(imgs):
            out = array_depth_pipeline(imgs, cams, cfg)
            return jnp.sum(out.refined_depth)
        return jnp.sum(jax.lax.map(one, batched_images))

    return run, jax.device_put(jnp.asarray(stack))


def _timed(run, x, salt):
    t0 = time.perf_counter()
    float(run(x + salt))
    return time.perf_counter() - t0


def main():
    import sys

    cascade = "--cascade" in sys.argv
    topology = "CROSS"
    if "--topology" in sys.argv:
        topology = sys.argv[sys.argv.index("--topology") + 1].upper()
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    small = _make(jax, jnp, B_SMALL, cascade=cascade, topology=topology)
    big = _make(jax, jnp, B_BIG, cascade=cascade, topology=topology)
    for run, x in (small, big):  # compile + warm twice
        _timed(run, x, 0.125)
        _timed(run, x, 0.25)

    estimates = []
    sustained = []  # big-batch secs/set: upper bound incl. dispatch overhead
    for rnd in range(MAX_ROUNDS):
        ts, tb = [], []
        for i in range(REPEATS):
            salt = 1.0 + 0.1 * i + 10.0 * rnd
            ts.append(_timed(*small, salt))
            tb.append(_timed(*big, salt + 0.05))
        sustained.append(statistics.median(tb) / B_BIG)
        per_set = (statistics.median(tb) - statistics.median(ts)) / (B_BIG - B_SMALL)
        if per_set <= 0:
            # tunnel noise inverted the slope (same documented failure mode
            # bench.py guards): a clamped epsilon would "agree" with a second
            # bad round and publish an absurd number — drop the round
            continue
        estimates.append(per_set)
        if len(estimates) >= 2:
            lo, hi = min(estimates[-2:]), max(estimates[-2:])
            if hi - lo <= 0.15 * hi:
                break

    if not estimates:
        estimates = [statistics.median(sustained)]
    per_set = statistics.median(estimates)
    sets_per_s = 1.0 / per_set
    print(
        json.dumps(
            {
                "metric": "array_pipeline_throughput"
                + ("_cascade" if cascade else "")
                + ("_" + topology.lower() if topology != "CROSS" else ""),
                "value": round(sets_per_s, 4),
                "unit": "frame_sets/s",
                "vs_baseline": round(sets_per_s / REF_EST_SETS_PER_S, 1),
                "ms_per_frame_set": round(per_set * 1e3, 1),
                "shape": [ROWS * COLS, H, W, PLANES],
                "topology": topology,
            }
        )
    )


if __name__ == "__main__":
    main()

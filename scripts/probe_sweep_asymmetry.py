"""Sweep-stage asymmetry probe (ROOFLINE_r05 follow-ups).

Questions, measured within-run (K-fenced batches, interleaved):

1. Why is the UP vertical stack slower than DOWN (0.516 vs 0.370 in the
   r5 perf_stages run)? Hypothesis: descending BlockSpec index order
   pipelines worse. A/B: reverse-sweep on vol vs forward-sweep on a
   pre-flipped vol (+ the flip's own cost) — if forward-on-flipped + two
   flips >= reverse, the asymmetry is not actionable (the flip round
   trip eats the win).

2. Are the single-path horizontal sweeps (~0.5 ms each vs ~0.15/path in
   the 3-stacked vertical) LATENCY-bound on their smaller (D, H) row
   front? A/B: same sweep at half the front height — a throughput-bound
   stage halves, a latency-bound one does not.
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
ap = argparse.ArgumentParser()
ap.add_argument("--repeats", type=int, default=9)
args = ap.parse_args()
import jax

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from stereovisionarray_tpu.ops.sgm_pallas import _sweep_hdw, _sweep_hdw_stacked

H, W, D = 540, 768, 64
rng = np.random.default_rng(0)
VOL = jnp.asarray(rng.integers(0, 200, (H, D, W)).astype(np.int16))
P2 = jnp.asarray(np.full((H, W), 384, np.int16))
VOL_T = jnp.asarray(rng.integers(0, 200, (W, D, H)).astype(np.int16))
P2_T = jnp.asarray(np.full((W, H), 384, np.int16))
# half front at a CLEAN lane multiple (270 would pad to 384 lanes and
# measure padding, not latency)
VOL_T_HALF = VOL_T[:, :, :256]
P2_T_HALF = P2_T[:, :256]


def fence(x):
    return jnp.sum(x.astype(jnp.int32) % 7)


progs = {
    "stack_down": lambda s: fence(_sweep_hdw_stacked(
        VOL + s.astype(jnp.int16), P2, 32, False, False)),
    "stack_up": lambda s: fence(_sweep_hdw_stacked(
        VOL + s.astype(jnp.int16), P2, 32, True, False)),
    "stack_down_on_flipped": lambda s: fence(_sweep_hdw_stacked(
        jnp.flip(VOL + s.astype(jnp.int16), axis=0), P2, 32, False, False)[::-1]),
    "horiz_fwd": lambda s: fence(_sweep_hdw(
        VOL_T + s.astype(jnp.int16), P2_T, 32, False, False, False)),
    "horiz_fwd_half": lambda s: fence(_sweep_hdw(
        VOL_T_HALF + s.astype(jnp.int16), P2_T_HALF, 32, False, False,
        False)),
}

K_S, K_B = 4, 16
built = {}
for tag, one in progs.items():
    built[tag] = {}
    for k, key in ((K_S, "s"), (K_B, "b")):
        @jax.jit
        def run(salts, one=one):
            # lax.map (NOT vmap): vmap prepends a batch dim to the Pallas
            # grids and times a different program than production
            return jnp.sum(jax.lax.map(one, salts))

        salts = jnp.arange(k, dtype=jnp.float32)
        for w in range(2):
            float(run(salts + 0.1 * w))
        built[tag][key] = (salts, run)

times = {t: {"s": [], "b": []} for t in built}
for i in range(args.repeats):
    for tag in built:
        for key in ("s", "b"):
            salts, run = built[tag][key]
            t0 = time.perf_counter()
            float(run(salts + 1 + 0.1 * i))
            times[tag][key].append(time.perf_counter() - t0)
for tag in built:
    per = (statistics.median(times[tag]["b"])
           - statistics.median(times[tag]["s"])) / (K_B - K_S) * 1e3
    print(f"{tag}: {per:7.3f} ms/call", flush=True)

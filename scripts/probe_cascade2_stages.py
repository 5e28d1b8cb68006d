"""Per-stage device cost of the SMOOTH cascade (round-5 perf tuning).

The r5 smooth cascade first measured 2.369 ms/frame vs the 1.845 budget
(>= 5x over flat's 8.77). This probe slope-times each stage as its own
lax.map batch program (bench.py tunnel rules: fat two-K slope, scalar
fence, salted inputs) to find where the ~1 ms of new machinery actually
lands: coarse pass / field build / pre-warp / fine pass / decode+post.
Within-run numbers are for RANKING (CLAUDE.md measurement rules).
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
ap.add_argument("--platform", default=None)
ap.add_argument("--repeats", type=int, default=7)
args = ap.parse_args()
if args.platform:
    os.environ["JAX_PLATFORMS"] = args.platform
import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses

import jax.numpy as jnp

import stereovisionarray_tpu.models.cascade as C
from stereovisionarray_tpu.config import CostConfig, SGMConfig
from stereovisionarray_tpu.models.two_view import two_view_disparity

H, W, TOTAL, FINE = 540, 768, 256, 32
COST = CostConfig(num_disparities=TOTAL, dtype="int8")
SGM = SGMConfig(p1=8.0, p2=96.0, num_paths=8)
COARSE_COST = dataclasses.replace(COST, num_disparities=64,
                                  census_window=(5, 5))
COARSE_COST_79 = dataclasses.replace(COST, num_disparities=64)
COARSE_SGM = dataclasses.replace(SGM, median_filter=True, speckle_window=9,
                                 fill_holes=True)
FINE_COST = dataclasses.replace(COST, num_disparities=FINE)


def stage_coarse(pair):
    l, r = pair
    co = two_view_disparity(C._area_downsample(l, 4), C._area_downsample(r, 4),
                            COARSE_COST, COARSE_SGM)
    cd = jnp.where(co.valid, co.disparity, 0.0) * 4.0
    return jax.image.resize(cd, l.shape, method="linear")


def stage_coarse79(pair):
    l, r = pair
    co = two_view_disparity(C._area_downsample(l, 4), C._area_downsample(r, 4),
                            COARSE_COST_79, COARSE_SGM)
    cd = jnp.where(co.valid, co.disparity, 0.0) * 4.0
    return jax.image.resize(cd, l.shape, method="linear")


def field_of(up):
    up_f = C._box_mean(up, 9)
    gx = jnp.clip(jnp.gradient(up_f, axis=1), 0.0, 1.0)
    sigma = jnp.clip(C._box_mean(gx, 25), 0.0, 0.7)
    return jnp.clip(up_f - 0.5 * FINE * (1.0 - sigma), 0.0, float(TOTAL - FINE))


def stage_field(pair):
    up, _ = pair
    return field_of(up)


def stage_warp(pair):
    s_star, r = pair
    w, se = C._smooth_prewarp(r, s_star, interpret=False)
    return w + se


def stage_fine(pair):
    l, wr = pair
    return two_view_disparity(l, wr, FINE_COST, SGM).disparity


def stage_decode(pair):
    from stereovisionarray_tpu.ops.hatsample import hat_sample

    fine_d, se = pair
    valid = fine_d >= 0
    t = jnp.clip(fine_d, 0.0, FINE - 1.0)
    off_at = hat_sample(se, t, 0, FINE - 1, interpret=False)
    d = jnp.where(valid, fine_d + off_at, -1.0)
    d = C.median3x3(d, valid)
    d, v = C.speckle_filter(d, valid, max_diff=1.5, window=5, min_support=8)
    return jnp.where(v, d, -1.0)


def stage_full(pair):
    l, r = pair
    return C.cascade_two_view_disparity(l, r, COST, SGM, coarse_factor=4,
                                        fine_disparities=FINE,
                                        band_step=8).disparity


def bench(fn, nb, repeats, seed):
    @jax.jit
    def run(a, b):
        return jnp.sum(jax.lax.map(fn, (a, b)))

    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.uniform(0, 200, (nb, H, W)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 200, (nb, H, W)).astype(np.float32))

    def t(salt):
        t0 = time.perf_counter()
        float(run(a + salt, b))
        return time.perf_counter() - t0

    for k in range(2):
        t(0.1 + 0.01 * k)
    return [t(1.0 + 0.1 * i) for i in range(repeats)]


stages = [
    ("coarse+up ", stage_coarse),
    ("coarse(7,9)", stage_coarse79),
    ("field     ", stage_field),
    ("warp      ", stage_warp),
    ("fine      ", stage_fine),
    ("decode+pf ", stage_decode),
    ("FULL      ", stage_full),
]
small, big = 2, 8
for name, fn in stages:
    ts = bench(fn, small, args.repeats, 1)
    tb = bench(fn, big, args.repeats, 2)
    per = (statistics.median(tb) - statistics.median(ts)) / (big - small)
    print(f"{name}: {per * 1e3:7.3f} ms/frame", flush=True)

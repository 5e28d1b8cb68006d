"""Cascade perf drill-down #3: (a) why does the (5,5)-census coarse pass
cost 4x the (7,9) one (1.04 vs 0.26 ms within-run — probe_cascade2_stages),
and which small window is fast? (b) what inside the smooth pre-warp costs
0.68 ms (the hat chain alone should be ~0.15)?
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
ap.add_argument("--repeats", type=int, default=7)
args = ap.parse_args()
import jax

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses

import jax.numpy as jnp

import stereovisionarray_tpu.models.cascade as C
from stereovisionarray_tpu.config import CostConfig, SGMConfig
from stereovisionarray_tpu.models.two_view import two_view_disparity
from stereovisionarray_tpu.ops.hatsample import hat_sample

H, W = 540, 768
SGMC = SGMConfig(p1=8.0, p2=96.0, num_paths=8)
CSGM = dataclasses.replace(SGMC, median_filter=True, speckle_window=9,
                           fill_holes=True)


def bench(fn, nb, repeats, seed, two=True):
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


def slope(fn, seed):
    ts = bench(fn, 2, args.repeats, seed)
    tb = bench(fn, 8, args.repeats, seed + 1)
    return (statistics.median(tb) - statistics.median(ts)) / 6 * 1e3


# ---- (a) coarse windows -------------------------------------------------
for win in ((5, 5), (5, 7), (7, 7), (7, 9), (5, 9)):
    cc = CostConfig(num_disparities=64, dtype="int8", census_window=win)

    def coarse(pair, cc=cc):
        l, r = pair
        co = two_view_disparity(C._area_downsample(l, 4),
                                C._area_downsample(r, 4), cc, CSGM)
        return jnp.where(co.valid, co.disparity, 0.0)

    print(f"coarse win={win}: {slope(coarse, 1):7.3f} ms/frame", flush=True)

# int16 for (5,5) (is the int8-scale-1 path the problem?)
cc16 = CostConfig(num_disparities=64, dtype="int16", census_window=(5, 5))


def coarse16(pair):
    l, r = pair
    co = two_view_disparity(C._area_downsample(l, 4),
                            C._area_downsample(r, 4), cc16, CSGM)
    return jnp.where(co.valid, co.disparity, 0.0)


print(f"coarse win=(5,5) int16: {slope(coarse16, 3):7.3f} ms/frame",
      flush=True)

# ---- (b) warp sub-stages ------------------------------------------------
def w_matmul(pair):
    img, s = pair
    g = jnp.mean(jnp.clip(s, 0, 224), axis=0)
    return C._hat_matmul_warp(img, g)


def w_chain(pair):
    img, s = pair
    r = jnp.clip(s - 100.0, -44.0, 44.0)
    g = jnp.mean(jnp.clip(s, 0, 224), axis=0)
    out, gs = hat_sample(img, r, -44, 44, aux=g, interpret=False)
    return out + gs


def w_chain_noaux(pair):
    img, s = pair
    r = jnp.clip(s - 100.0, -44.0, 44.0)
    return hat_sample(img, r, -44, 44, interpret=False)


def w_field(pair):
    up, _ = pair
    up_f = C._box_mean(up, 9)
    gx = jnp.clip(jnp.gradient(up_f, axis=1), 0.0, 1.0)
    sigma = jnp.clip(C._box_mean(gx, 25), 0.0, 0.7)
    s_star = jnp.clip(up_f - 16.0 * (1.0 - sigma), 0.0, 224.0)
    g = jnp.mean(s_star, axis=0)
    gp = jnp.convolve(jnp.gradient(g), jnp.ones(9, jnp.float32) / 9.0,
                      mode="same")
    gp = jnp.clip(gp, -0.2, 0.7)
    return jnp.clip((s_star - g[None, :]) / (1.0 - gp[None, :]), -44.0, 44.0)


def w_full(pair):
    img, s = pair
    up_f = C._box_mean(s, 9)
    gx = jnp.clip(jnp.gradient(up_f, axis=1), 0.0, 1.0)
    sigma = jnp.clip(C._box_mean(gx, 25), 0.0, 0.7)
    s_star = jnp.clip(up_f - 16.0 * (1.0 - sigma), 0.0, 224.0)
    w, se = C._smooth_prewarp(img, s_star, interpret=False)
    return w + se


for name, fn in (("matmul   ", w_matmul), ("chain+aux", w_chain),
                 ("chain    ", w_chain_noaux), ("fieldprep", w_field),
                 ("warp full", w_full)):
    print(f"warp {name}: {slope(fn, 11):7.3f} ms/frame", flush=True)

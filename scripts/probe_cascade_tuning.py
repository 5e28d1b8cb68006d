"""Round-5 cascade tuning probes (the measurement evidence behind the
production defaults in models/cascade.py — CLAUDE.md round-5 notes).

Each subcommand is one of the device A/Bs run during round 5; all use the
interleaved fat-spread slope protocol (every program measured inside each
repeat so tunnel drift is shared — see perf_cascade.py's docstring; the
sequential protocol mis-read the cascade by +-0.4 ms/frame across runs).

  paths   — fine-pass SGM paths 8 vs 4 (accuracy + interleaved timing).
            Result of record: paths4 bad-2 0.037% vs 0.024%, -0.23 ms.
            NOTE: per-pass isolation (fresh processes, because of the
            jit-cache monkeypatch trap) showed the COARSE pass must keep
            8 paths — coarse-4 blows the sustained-slope fixture to 1.3%.
  radius  — SMOOTH_R 36 vs 44 via the THREADED smooth_r static arg.
            Result of record: identical accuracy, 1.889 vs 1.911 ms —
            the 0.44 ms "R effect" first seen across processes was
            tunnel drift, not taps.
  df      — fine_disparities 24 vs 32 (24: bad-2 0.047%, 5.3x; 32:
            0.028%, 4.75x — 24 is the eval protocol config).
  d64     — cascade at the BENCH shape (540x768x64): 0.505 vs flat
            2.202 ms, but golden-fixture bad-2 2.8% vs 0.73% (16-plane
            coarse too coarse) — flat stays the bench metric
            (ROOFLINE_r05.json).

Usage: python scripts/probe_cascade_tuning.py {paths,radius,df,d64}
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
ap.add_argument("what", choices=("paths", "radius", "df", "d64"))
ap.add_argument("--repeats", type=int, default=9)
args = ap.parse_args()
import jax

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_cascade import FACTOR, H, TOTAL, W, make_scene
from stereovisionarray_tpu.config import CostConfig, SGMConfig
import stereovisionarray_tpu.models.cascade as C
from stereovisionarray_tpu.models.two_view import two_view_disparity

COST = CostConfig(num_disparities=TOTAL, dtype="int8")
SGM8 = SGMConfig(p1=8.0, p2=96.0, num_paths=8)
left, right, gt, mask = make_scene(np.random.default_rng(0), H, W)
lj, rj = jnp.asarray(left), jnp.asarray(right)


def accuracy(tag, **kw):
    out = jax.jit(lambda l, r: C.cascade_two_view_disparity(
        l, r, COST, SGM8, coarse_factor=FACTOR, band_step=8, **kw))(lj, rj)
    d = np.asarray(out.disparity)
    v = np.asarray(out.valid)
    m = mask & v & (d >= 0)
    err = np.abs(d - gt)[m]
    print(f"{tag}: valid={m.sum() / mask.sum():.4f} "
          f"bad2={float((err > 2).mean()):.5f} epe={err.mean():.3f}",
          flush=True)


def interleaved(progs, nb=(4, 20)):
    """progs: {tag: one_fn}; prints ms/frame slopes measured interleaved."""
    built = {}
    for tag, one in progs.items():
        built[tag] = {}
        for n, key in zip(nb, ("s", "b")):
            @jax.jit
            def run(a, b, one=one):
                return jnp.sum(jax.lax.map(one, (a, b)))

            rng = np.random.default_rng(n)
            a = jnp.asarray(rng.uniform(0, 200, (n, H, W)).astype(np.float32))
            b = jnp.asarray(rng.uniform(0, 200, (n, H, W)).astype(np.float32))
            for k in range(2):
                float(run(a + 0.1 * k, b))
            built[tag][key] = (a, b, run)
    times = {t: {"s": [], "b": []} for t in built}
    for i in range(args.repeats):
        for tag in built:
            for key in ("s", "b"):
                a, b, run = built[tag][key]
                t0 = time.perf_counter()
                float(run(a + 1 + 0.1 * i, b))
                times[tag][key].append(time.perf_counter() - t0)
    out = {}
    for tag in built:
        per = (statistics.median(times[tag]["b"])
               - statistics.median(times[tag]["s"])) / (nb[1] - nb[0]) * 1e3
        out[tag] = per
        print(f"{tag}: {per:.3f} ms/frame", flush=True)
    return out


def casc_one(**kw):
    return lambda p: C.cascade_two_view_disparity(
        p[0], p[1], COST, SGM8, coarse_factor=FACTOR, band_step=8,
        **kw).disparity


flat_one = lambda p: two_view_disparity(p[0], p[1], COST, SGM8).disparity

if args.what == "paths":
    accuracy("fine paths=4 (default)", fine_disparities=32)
    accuracy("fine paths=8", fine_disparities=32, internal_paths=None)
    interleaved({"paths4": casc_one(fine_disparities=32),
                 "paths8": casc_one(fine_disparities=32,
                                    internal_paths=None),
                 "flat": flat_one})
elif args.what == "radius":
    # smooth_r is a STATIC ARG (threaded precisely so this A/B cannot hit
    # the jit-cache monkeypatch trap)
    accuracy("R=36", fine_disparities=32, smooth_r=36)
    accuracy("R=44", fine_disparities=32, smooth_r=44)
    interleaved({"R36": casc_one(fine_disparities=32, smooth_r=36),
                 "R44": casc_one(fine_disparities=32, smooth_r=44),
                 "flat": flat_one})
elif args.what == "df":
    accuracy("df=24", fine_disparities=24)
    accuracy("df=32", fine_disparities=32)
    interleaved({"df24": casc_one(fine_disparities=24),
                 "df32": casc_one(fine_disparities=32),
                 "flat": flat_one})
elif args.what == "d64":
    cost64 = CostConfig(num_disparities=64, dtype="int8")

    def c64(p):
        return C.cascade_two_view_disparity(
            p[0], p[1], cost64, SGM8, coarse_factor=4, fine_disparities=24,
            band_step=8).disparity

    def f64(p):
        return two_view_disparity(p[0], p[1], cost64, SGM8).disparity

    interleaved({"casc64": c64, "flat64": f64}, nb=(2, 8))

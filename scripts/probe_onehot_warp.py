"""Device cost of a K-tap one-hot BILINEAR warp chain at (540, 768).

The smooth-prewarp cascade (models/cascade.py v2) needs
wright(x) = (1-frac)*right(x-floor(s)) + frac*right(x-floor(s)-1) for a
per-pixel float field s in [0, K). The TPU-legal realization is a K-tap
hat-weight select-sum  out = sum_k max(0, 1-|s-k|) * right(x-k)  (never a
per-pixel gather). Question: does XLA fuse the K-term chain into one pass
(≈ traffic-bound, ~0.2 ms) or materialize per-tap (≈ K * 3 MB, dead)?

Timing: bench.py tunnel rules — lax.map over a batch inside ONE dispatch,
fat two-K slope, scalar-reduce fence, salted inputs.
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
import jax.numpy as jnp

H, W = 540, 768


def hat_warp(img, s, taps):
    """out(x) = sum_k hat(s(x)-k) * img(x-k); img edge-padded via concat."""
    out = jnp.zeros_like(img)
    for k in range(taps):
        if k == 0:
            sh = img
        else:
            sh = jnp.concatenate([img[:, :1].repeat(k, 1), img[:, :-k]], 1)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(s - float(k)))
        out = out + w * sh
    return out


def bench(taps, nb, repeats):
    def one(pair):
        img, s = pair
        return hat_warp(img, s * (taps - 1), taps)

    @jax.jit
    def run(imgs, ss):
        return jnp.sum(jax.lax.map(one, (imgs, ss)))

    rng = np.random.default_rng(taps)
    imgs = jnp.asarray(rng.uniform(0, 255, (nb, H, W)).astype(np.float32))
    ss = jnp.asarray(rng.uniform(0, 1, (nb, H, W)).astype(np.float32))

    def t(salt):
        t0 = time.perf_counter()
        float(run(imgs + salt, ss))
        return time.perf_counter() - t0

    for k in range(2):
        t(0.1 + 0.01 * k)
    return [t(1.0 + 0.1 * i) for i in range(repeats)]


def slope(taps, repeats):
    small, big = 4, 16
    ts = bench(taps, small, repeats)
    tb = bench(taps, big, repeats)
    per = (statistics.median(tb) - statistics.median(ts)) / (big - small)
    return per * 1e3


for taps in (29, 64, 113, 225):
    ms = slope(taps, args.repeats)
    print(f"taps={taps}: {ms:.3f} ms/frame", flush=True)

# numerical check vs numpy gather
rng = np.random.default_rng(0)
img = rng.uniform(0, 255, (H, W)).astype(np.float32)
s = (rng.uniform(0, 1, (H, W)) * 200).astype(np.float32)
out = np.asarray(jax.jit(lambda a, b: hat_warp(a, b, 225))(jnp.asarray(img),
                                                           jnp.asarray(s)))
x = np.arange(W)[None, :]
p0 = np.floor(s).astype(np.int64)
fr = s - p0
i0 = np.clip(x - p0, None, W - 1)
i1 = np.clip(x - p0 - 1, None, W - 1)
rows = np.arange(H)[:, None]
ref = (1 - fr) * img[rows, np.maximum(i0, 0)] + fr * img[rows, np.maximum(i1, 0)]
# edge-replicate semantics match only for x-p0 >= 1; compare interior
m = (x - p0 - 1) >= 0
print("max |err| interior:", float(np.abs(out - ref)[m].max()))

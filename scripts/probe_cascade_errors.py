"""Diagnose the cascade two-view bad-2 tail (VERDICT r4 item 1).

EVAL_CASCADE_r04: cascade bad-2 = 1.25% vs flat 0.008% at 540x768 D=256 on
a SMOOTH scene (slanted ramp + bump, no depth discontinuities) — so every
bad pixel is a band-quantization artifact. This probe categorizes them:

1. error-magnitude histogram of bad pixels (are errors ~exactly +-q?)
2. distance to the nearest band seam (columns where the band field jumps)
3. would a coarse-consistent snap d' = d + q*round((up - d)/q) (clipped to
   one step, gated to the seam strip on smooth coarse gradients) fix them?

Conclusions feed models/cascade.py's seam mitigation.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)

import argparse

ap = argparse.ArgumentParser()
ap.add_argument("--platform", default=None)
args = ap.parse_args()
if args.platform:
    os.environ["JAX_PLATFORMS"] = args.platform
import jax

if args.platform:
    jax.config.update("jax_platforms", args.platform)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from perf_cascade import FACTOR, FINE, H, STEP, TOTAL, W, make_scene
from stereovisionarray_tpu.config import CostConfig, SGMConfig
from stereovisionarray_tpu.models.cascade import cascade_two_view_disparity

cost = CostConfig(num_disparities=TOTAL, dtype="int8")
sgm = SGMConfig(p1=8.0, p2=96.0, num_paths=8)

left, right, gt, mask = make_scene(np.random.default_rng(0), H, W)
out = jax.jit(
    lambda l, r: cascade_two_view_disparity(
        l, r, cost, sgm, coarse_factor=FACTOR, fine_disparities=FINE,
        band_step=STEP,
    )
)(jnp.asarray(left), jnp.asarray(right))

d = np.asarray(out.disparity)
up = np.asarray(out.coarse_disparity)
off = np.asarray(out.band_offset).astype(np.int64)
valid = np.asarray(out.valid)

m = mask & valid
err = d - gt
bad = m & (np.abs(err) > 2.0)
print(f"valid_in_mask={m.sum()/mask.sum():.4f}  bad2={bad.sum()/m.sum():.5f}"
      f"  n_bad={bad.sum()}")

# 1. error histogram of bad pixels
e = err[bad]
print("bad err percentiles:", np.percentile(np.abs(e), [5, 25, 50, 75, 95]).round(2))
for center in (STEP, 2 * STEP, 3 * STEP):
    frac = (np.abs(np.abs(e) - center) < 1.0).mean()
    print(f"  |err| within 1.0 of {center}: {frac:.3f}")
print(f"  err sign: neg={float((e<0).mean()):.3f} pos={float((e>0).mean()):.3f}")

# 2. distance to nearest band seam (horizontal, in the offset field)
band = off // STEP
seam = np.zeros_like(band, bool)
seam[:, 1:] |= band[:, 1:] != band[:, :-1]
seam[1:, :] |= band[1:, :] != band[:-1, :]
# distance transform along rows (cheap approx: min over window radii)
dist = np.full(band.shape, 99, np.int32)
for r in range(0, 25):
    hit = np.zeros_like(seam)
    for s in range(-r, r + 1):
        hit |= np.roll(seam, s, axis=1)
    dist = np.where((dist == 99) & hit, r, dist)
print("bad-pixel dist-to-seam percentiles:",
      np.percentile(dist[bad], [5, 25, 50, 75, 95, 99]))
print("all-pixel dist<=6 fraction:", float((dist[m] <= 6).mean()))
print("bad-pixel dist<=6 fraction:", float((dist[bad] <= 6).mean()))

# 3. snap rescue: one band step toward the coarse prediction
snap_steps = np.clip(np.round((up - d) / STEP), -1, 1)
d_snap = d + STEP * snap_steps
# gates: inside the seam strip, smooth coarse gradient
gx = np.abs(np.gradient(up, axis=1))
for strip_r, grad_max in [(6, 0.6), (8, 0.6), (8, 1.0), (10, 1.5), (99, 99)]:
    gate = (dist <= strip_r) & (gx < grad_max)
    d_fix = np.where(gate & m, d_snap, d)
    bad_fix = m & (np.abs(d_fix - gt) > 2.0)
    print(f"snap strip<={strip_r} grad<{grad_max}: bad2 "
          f"{bad_fix.sum()/m.sum():.5f} (n={bad_fix.sum()}) "
          f"gate_frac={gate[m].mean():.3f}")

# 4. how close is snapped-to-truth on the rescued pixels?
gate = (dist <= 8) & (gx < 1.0)
resc = bad & gate
if resc.sum():
    es = np.abs(d_snap - gt)[resc]
    print("snap err on previously-bad gated px:",
          np.percentile(es, [50, 75, 90, 95, 99]).round(2))
# 5. residual bad after snap: where are they?
d_fix = np.where(gate & m, d_snap, d)
badr = m & (np.abs(d_fix - gt) > 2.0)
if badr.sum():
    print("residual bad:", badr.sum(), "dist-to-seam:",
          np.percentile(dist[badr], [25, 50, 75, 95]),
          "err:", np.percentile(np.abs(d_fix - gt)[badr], [25, 50, 75, 95]).round(2))

"""Round-5 smooth-cascade residual-tail diagnosis (bad2 0.167% vs bar 0.1%).

Runs the PRODUCTION smooth cascade on the eval scene and classifies bad
pixels: residual clamp, field-vs-truth coverage, fine-index position,
spatial structure.
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
        band_step=STEP, mode="smooth",
    )
)(jnp.asarray(left), jnp.asarray(right))

d = np.asarray(out.disparity)
se = np.asarray(out.band_offset)  # s_eff
up = np.asarray(out.coarse_disparity)
valid = np.asarray(out.valid)
conf = np.asarray(out.confidence)

m = mask & valid
err = d - gt
bad = m & (np.abs(err) > 2.0)
print(f"valid={m.sum()/mask.sum():.4f} bad2={bad.sum()/m.sum():.5f} n={bad.sum()}")
print("err at bad:", np.percentile(np.abs(err[bad]), [25, 50, 75, 95]).round(1))

# coverage: residual fine-truth index = solve gt = r_idx + se(x - r_idx)
x = np.arange(W)[None, :]
rows = np.arange(H)[:, None]
# approx: idx0 = gt - se(x); refine twice
idx = np.clip(gt - se, 0, FINE - 1)
for _ in range(3):
    xs = np.clip(np.round(x - idx).astype(np.int64), 0, W - 1)
    idx = gt - np.take_along_axis(se, xs, axis=1)
print("true fine-index pct (all):", np.percentile(idx[m], [1, 5, 50, 95, 99]).round(1))
print("true fine-index at bad:", np.percentile(idx[bad], [5, 25, 50, 75, 95]).round(1))
out_of_window = (idx < 0.5) | (idx > FINE - 1.5)
print(f"out-of-window frac: all={out_of_window[m].mean():.4f} bad={out_of_window[bad].mean():.4f}")

# coarse error at bad
ce = np.abs(up - gt)
print("coarse err at bad:", np.percentile(ce[bad], [25, 50, 75, 95]).round(1))
# confidence at bad (should be LOW if capped correctly)
print("conf at bad:", np.percentile(conf[bad], [25, 50, 75, 95]).round(2))

cols = np.where(bad.any(0))[0]
runs = np.split(cols, np.where(np.diff(cols) > 2)[0] + 1)
print("bad col runs:", [(int(r[0]), len(r)) for r in runs][:16])
rws = np.where(bad.any(1))[0]
print("bad row span:", (rws.min(), rws.max()) if len(rws) else None,
      "n rows:", len(rws))

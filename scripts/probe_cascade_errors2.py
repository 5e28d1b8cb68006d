"""Cascade tail diagnosis round 2: is the COARSE map or the FINE match at
fault at the bad pixels? (probe_cascade_errors.py showed errors are not
+-q multiples and snapping toward the coarse map makes it worse.)"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)

import jax

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
print(f"n_bad={bad.sum()}  bad2={bad.sum()/m.sum():.5f}")

# coarse map quality at bad vs good pixels
ce = np.abs(up - gt)
print("coarse |up-gt| at GOOD px:", np.percentile(ce[m & ~bad], [50, 90, 99]).round(2))
print("coarse |up-gt| at BAD px:", np.percentile(ce[bad], [25, 50, 75, 90, 99]).round(2))

# does the band contain the truth? need gt in [off, off+FINE)
contains = (gt >= off) & (gt <= off + FINE - 1)
print(f"band contains truth: good={contains[m & ~bad].mean():.4f} "
      f"bad={contains[bad].mean():.4f}")

# where is the fine winner inside the window? d_fine = d - off_at; off_at
# is off sampled at x - round(d_fine) — recover approximately:
# d_fine ~ d - off(x) away from seams; exact: find df such that
# df + off(x-round(df)) == d. Try all df in [0,FINE):
x = np.arange(W)[None, :].repeat(H, 0)
d_fine = np.full_like(d, -1.0)
for df in range(FINE):
    xs = np.clip(x - df, 0, W - 1)
    tot = df + off[np.arange(H)[:, None].repeat(W, 1), xs] + (d - np.round(d))
    hit = np.abs(tot - d) < 0.5
    d_fine = np.where(hit & (d_fine < 0), df + (d - np.round(d)), d_fine)
print("fine-winner position percentiles GOOD:",
      np.percentile(d_fine[m & ~bad & (d_fine >= 0)], [5, 25, 50, 75, 95]).round(1))
print("fine-winner position percentiles BAD:",
      np.percentile(d_fine[bad & (d_fine >= 0)], [5, 25, 50, 75, 95]).round(1))
print("unrecovered d_fine frac:", float((d_fine[m] < 0).mean()))

# spatial structure: column histogram of bad pixels (seams are ~vertical)
cols = np.where(bad.any(0))[0]
print(f"bad columns: {len(cols)} of {W}; runs:")
runs = np.split(cols, np.where(np.diff(cols) > 2)[0] + 1)
print("  run widths:", [len(r) for r in runs][:30])
print("  run starts:", [int(r[0]) for r in runs][:30])

# per-run mean err and mean (up-gt)
for r in runs[:12]:
    sel = bad[:, r[0]:r[-1] + 1]
    e = err[:, r[0]:r[-1] + 1][sel]
    c = (up - gt)[:, r[0]:r[-1] + 1][sel]
    print(f"  cols {r[0]}-{r[-1]}: n={sel.sum()} err_med={np.median(e):.1f} "
          f"coarse_err_med={np.median(c):.1f}")

"""Accuracy probe for the SEAM-FREE banded fine volume (cascade fix).

Hypothesis (probe_cascade_errors2.py): the cascade tail comes from census
windows straddling band-warp seams in the warped RIGHT IMAGE — duplicated
strips create false matches one band down, and SGM locks whole steep-slope
regions -8/-16 px. Census is shift-equivariant, so warping CENSUS CODES
(equivalently: fine_vol[y,x,d] = flat_vol[y,x,d + off(x-d)]) gives a fine
volume whose every entry is a TRUE flat-volume cost — no duplicated
content, no seam corruption.

This probe validates the accuracy claim on CPU by assembling the banded
volume directly from a flat XLA volume (numpy gather — probe only; the
production path warps census codes) and running the standard XLA SGM +
extraction on it. Compares: flat / banded-image-warp (current cascade
mechanism) / banded-code (proposed).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from perf_cascade import FACTOR, FINE, STEP, TOTAL, make_scene
from stereovisionarray_tpu.config import CostConfig, SGMConfig
from stereovisionarray_tpu.models.cascade import _select_shifted
from stereovisionarray_tpu.models.two_view import two_view_disparity
from stereovisionarray_tpu.ops.cost_volume import fused_cost_volume, right_from_left_volume
from stereovisionarray_tpu.ops.sgm import sgm_aggregate
from stereovisionarray_tpu.ops.wta import disparity_from_volume

H, W = 270, 768  # fewer rows than the eval (CPU probe) — full W for range

cost = CostConfig(num_disparities=TOTAL, dtype="float32")
sgm = SGMConfig(p1=8.0, p2=96.0, num_paths=8)

left, right, gt, mask = make_scene(np.random.default_rng(0), H, W)
lj, rj = jnp.asarray(left), jnp.asarray(right)


def extract(vol, image):
    agg = sgm_aggregate(vol, p1=sgm.p1, p2=sgm.p2, num_paths=sgm.num_paths,
                        image=image, adaptive_p2=sgm.adaptive_p2,
                        p2_min=sgm.p2_min)
    vol_right = right_from_left_volume(agg)
    return disparity_from_volume(
        agg, vol_right=vol_right, subpixel=sgm.subpixel,
        uniqueness=sgm.uniqueness, lr_max_diff=sgm.lr_max_diff,
    )


def score(name, d, valid):
    m = mask & np.asarray(valid) & (np.asarray(d) >= 0)
    err = np.abs(np.asarray(d) - gt)[m]
    print(f"{name}: valid={m.sum()/mask.sum():.4f} bad2={float((err>2).mean()):.5f} "
          f"epe={err.mean():.3f} med={np.median(err):.3f}", flush=True)


# ---- 1. flat reference (XLA, D=256) ------------------------------------
flat_vol = np.asarray(fused_cost_volume(lj, rj, TOTAL,
                                        census_window=cost.census_window,
                                        bt_weight=cost.bt_weight,
                                        bt_clip=cost.bt_clip))
res = extract(jnp.asarray(flat_vol), lj)
score("flat      ", res.disparity, res.valid)

# ---- 2. coarse pass -> band offsets (same as models/cascade.py) --------
from stereovisionarray_tpu.models.cascade import cascade_two_view_disparity

casc = cascade_two_view_disparity(lj, rj, CostConfig(num_disparities=TOTAL,
                                                     dtype="float32"),
                                  sgm, coarse_factor=FACTOR,
                                  fine_disparities=FINE, band_step=STEP,
                                  backend="xla")
score("casc(image)", casc.disparity, casc.valid)
off = np.asarray(casc.band_offset).astype(np.int64)  # (H, W) multiples of q
up = np.asarray(casc.coarse_disparity)

# ---- 3. banded-code volume: fine[y,x,d] = flat[y,x,d+off(x-d)] ----------
x = np.arange(W)[None, :]
fine_vol = np.empty((H, W, FINE), np.float32)
for d in range(FINE):
    xs = np.clip(x - d, 0, W - 1)          # where the match lands
    total_d = d + off[np.arange(H)[:, None], xs]  # (H, W)
    fine_vol[:, :, d] = np.take_along_axis(flat_vol, total_d[:, :, None],
                                           axis=2)[:, :, 0]

res_f = extract(jnp.asarray(fine_vol), lj)
d_fine = np.asarray(res_f.disparity)
valid_f = np.asarray(res_f.valid)

# decode: total = d_fine + off(x - round(d_fine)) — same one-hot as prod
df_round = np.clip(np.round(d_fine).astype(np.int64), 0, FINE - 1)
off_at = np.take_along_axis(
    off, np.clip(x - df_round, 0, W - 1), axis=1
)
d_total = np.where(valid_f & (d_fine >= 0), d_fine + off_at, -1.0)
score("casc(code) ", d_total, valid_f)

# error structure of remaining bad pixels
m = mask & valid_f & (d_total >= 0)
err = d_total - gt
bad = m & (np.abs(err) > 2.0)
if bad.sum():
    print("residual bad:", bad.sum(),
          "err pct:", np.percentile(np.abs(err[bad]), [25, 50, 75, 95]).round(1),
          "coarse err med:", round(float(np.median(np.abs(up - gt)[bad])), 2))

"""Verification drive: library surface end-to-end (synthetic rectified pair ->
fused cost volume -> 8-path SGM -> disparity extraction -> bad-2.0)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from stereovisionarray_tpu.ops import fused_cost_volume, sgm_aggregate, disparity_from_volume
from stereovisionarray_tpu.ops.cost_volume import right_from_left_volume
from stereovisionarray_tpu.evaluation import bad_pixel_ratio, end_point_error

rng = np.random.default_rng(0)
H, W, D = 96, 128, 32
tex = rng.uniform(0, 255, size=(H, W + 64)).astype(np.float32)
tex = (tex + np.roll(tex, 1, 1) + np.roll(tex, -1, 1) + np.roll(tex, 1, 0) + np.roll(tex, -1, 0)) / 5

# geometrically consistent piecewise-constant scene:
# left-image box x in [40,90), rows [30,70), d=14; background d=6.
d_bg, d_fg = 6, 14
x0, x1, y0, y1 = 40, 90, 30, 70
gt = np.full((H, W), float(d_bg), dtype=np.float32)
gt[y0:y1, x0:x1] = d_fg
xs = np.arange(W)
left = np.stack([tex[y, xs + 20] for y in range(H)])
right = np.empty_like(left)
for y in range(H):
    fg_right = (y0 <= y < y1)
    box_right = (xs >= x0 - d_fg) & (xs < x1 - d_fg) if fg_right else np.zeros(W, bool)
    # right[x] shows the surface visible at right-cam pixel x (fg wins: nearer)
    right[y] = np.where(box_right, tex[y, xs + 20 + d_fg], tex[y, xs + 20 + d_bg])
# occlusion: background pixels whose match is covered by the box in the right view
occ = np.zeros((H, W), bool)
occ[y0:y1, x0 - (d_fg - d_bg):x0] = True
mask = jnp.asarray((xs[None, :] >= gt + 1) & ~occ)  # non-occluded, in-view

Lj, Rj = jnp.asarray(left), jnp.asarray(right)
vol = fused_cost_volume(Lj, Rj, D)
agg = sgm_aggregate(vol, p1=8.0, p2=96.0, num_paths=8)
res = disparity_from_volume(agg, vol_right=right_from_left_volume(agg),
                            subpixel=True, uniqueness=0.95, lr_max_diff=1.25)
bad = float(bad_pixel_ratio(res.disparity, jnp.asarray(gt), 2.0, mask=mask))
epe = float(end_point_error(res.disparity, jnp.asarray(gt), mask=mask))
print(f"8-path SGM: bad2.0(nonocc)={bad:.4f} epe={epe:.3f} valid={float(res.valid.mean()):.3f}")
assert bad < 0.03, bad

agg4 = sgm_aggregate(vol, p1=8.0, p2=96.0, num_paths=4)
r4 = disparity_from_volume(agg4, subpixel=False)
b4 = float(bad_pixel_ratio(r4.disparity, jnp.asarray(gt), 2.0, mask=mask))
print(f"4-path, no extras: bad2.0={b4:.4f}")
assert b4 < 0.05, b4

r0 = disparity_from_volume(vol, subpixel=False)
b0 = float(bad_pixel_ratio(r0.disparity, jnp.asarray(gt), 2.0, mask=mask))
print(f"raw WTA (no SGM): bad2.0={b0:.4f}  (random texture: WTA already near-perfect)")
assert abs(b4 - b0) < 0.02  # SGM must not wreck an easy scene

# ambiguous scene: vertical-stripe texture (horizontally aliased) + smooth ramp.
# WTA aliases badly; SGM's smoothness prior must resolve it.
stripe = (np.sin(np.arange(W + 64) * 2.2)[None, :] * 40 + 128).astype(np.float32)
stripe = np.repeat(stripe, H, 0) + rng.normal(0, 2.0, (H, W + 64)).astype(np.float32)
gt2 = np.full((H, W), 8.0, np.float32)
l2 = np.stack([stripe[y, xs + 16] for y in range(H)])
r2 = np.stack([stripe[y, xs + 16 + 8] for y in range(H)])
m2 = jnp.asarray(xs[None, :] >= 9)
v2 = fused_cost_volume(jnp.asarray(l2), jnp.asarray(r2), D)
wta_b = float(bad_pixel_ratio(disparity_from_volume(v2, subpixel=False).disparity, jnp.asarray(gt2), 2.0, mask=m2))
sgm_b = float(bad_pixel_ratio(disparity_from_volume(sgm_aggregate(v2, num_paths=8), subpixel=False).disparity, jnp.asarray(gt2), 2.0, mask=m2))
print(f"aliased stripes: WTA bad2.0={wta_b:.4f}  SGM bad2.0={sgm_b:.4f} (SGM must improve)")
assert sgm_b <= wta_b

vol2 = fused_cost_volume(Lj[:50, :75], Rj[:50, :75], 17)
agg2 = sgm_aggregate(vol2, num_paths=8)
print("odd shapes (50,75,17):", agg2.shape, "finite:", bool(jnp.isfinite(agg2).all()))
assert agg2.shape == (50, 75, 17)

volc = fused_cost_volume(jnp.ones((32, 48)), jnp.ones((32, 48)), 16)
rc = disparity_from_volume(sgm_aggregate(volc), subpixel=True)
assert bool(jnp.isfinite(rc.disparity).all())
print("degenerate constant image: finite, no NaN")
print("DRIVE OK")

# ---------------------------------------------------------------------- #
# Full-surface drive: synthetic array render -> two_view pipeline -> PNGs
# ---------------------------------------------------------------------- #
from stereovisionarray_tpu.config import CostConfig, SGMConfig
from stereovisionarray_tpu.datasets import SceneSpec, reference_rig, render_view
from stereovisionarray_tpu.datasets.io import save_png
from stereovisionarray_tpu.models import two_view_disparity, depth_to_disparity

res = (96, 128)
rig = reference_rig(resolution=res)
img_c, dep_c = render_view(rig, 12, res, SceneSpec())
img_l, _ = render_view(rig, 11, res, SceneSpec())
Bm = float(np.linalg.norm(np.asarray(rig.centers)[12] - np.asarray(rig.centers)[11]))
fx = float(rig.fx[12])
gtd = np.asarray(depth_to_disparity(jnp.asarray(dep_c), Bm, fx))
out = two_view_disparity(jnp.asarray(img_c[:, ::-1]), jnp.asarray(img_l[:, ::-1]),
                         CostConfig(num_disparities=16), SGMConfig(),
                         baseline=Bm, focal_px=fx)
m = jnp.asarray(np.arange(res[1])[None, :] >= gtd[:, ::-1] + 1)
bad_syn = float(bad_pixel_ratio(out.disparity, jnp.asarray(gtd[:, ::-1]), 2.0, mask=m))
print(f"synthetic render -> pipeline: bad2.0={bad_syn:.4f}")
assert bad_syn < 0.08, bad_syn
import tempfile, os as _os
with tempfile.TemporaryDirectory() as td:
    save_png(_os.path.join(td, "disp.png"), np.asarray(out.disparity))
    save_png(_os.path.join(td, "err.png"), np.asarray(out.depth) - dep_c[:, ::-1])
    assert _os.path.getsize(_os.path.join(td, "disp.png")) > 100
print("artifact PNGs written OK")
print("FULL DRIVE OK")

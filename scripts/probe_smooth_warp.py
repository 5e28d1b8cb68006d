"""Accuracy probe for the SMOOTH-PREWARP cascade fine pass (cascade fix v2).

probe_banded_volume.py showed band-quantized fine volumes keep a ~0.8%
bad-2 tail even with seam-free costs: the fine-index truth is a SAWTOOTH
on steep slopes (ramps + q-drops every ~q/slope px), which breaks SGM
smoothing, uniqueness, and LR checking near every seam.

Fix: warp the right view by the CONTINUOUS coarse disparity field
s(x) = clip(up(x) - Df/2, 0, total - Df) (bilinear resample — classic
coarse-to-fine warping). The fine-index truth becomes ~constant (= Df/2 +
coarse error), SGM sees a nearly fronto-parallel problem, and there are
no content seams at all. Decode: total = d_f + s(x - d_f) (lerp sample).

This probe uses numpy gather for the warp (CPU validation only — the
production realization is a 2-level composed one-hot shift, see
models/cascade.py). Compares flat / current-band-cascade / smooth-warp.
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
from stereovisionarray_tpu.models.cascade import cascade_two_view_disparity
from stereovisionarray_tpu.models.two_view import two_view_disparity

H, W = 270, 768
S_MAX = TOTAL - FINE

cost_flat = CostConfig(num_disparities=TOTAL, dtype="float32")
cost_fine = CostConfig(num_disparities=FINE, dtype="float32")
sgm = SGMConfig(p1=8.0, p2=96.0, num_paths=8)

left, right, gt, mask = make_scene(np.random.default_rng(0), H, W)
lj, rj = jnp.asarray(left), jnp.asarray(right)


def score(name, d, valid):
    m = mask & np.asarray(valid) & (np.asarray(d) >= 0)
    err = np.abs(np.asarray(d) - gt)[m]
    print(f"{name}: valid={m.sum()/mask.sum():.4f} bad2={float((err>2).mean()):.5f} "
          f"epe={err.mean():.3f} med={np.median(err):.3f}", flush=True)


# flat reference
res = two_view_disparity(lj, rj, cost_flat, sgm, backend="xla")
score("flat       ", res.disparity, res.valid)

# current band cascade (for the coarse field + comparison)
casc = cascade_two_view_disparity(lj, rj, cost_flat, sgm,
                                  coarse_factor=FACTOR,
                                  fine_disparities=FINE, band_step=STEP,
                                  backend="xla")
score("casc(band) ", casc.disparity, casc.valid)
up = np.asarray(casc.coarse_disparity)

# ---- smooth warp variants (numpy gather prototype) ---------------------
def box2d(a, r):
    """(2r+1)^2 box mean via cumsum, edge-replicated."""
    ap = np.pad(a, r, mode="edge")
    c = np.cumsum(np.cumsum(ap, 0), 1)
    c = np.pad(c, ((1, 0), (1, 0)))
    n = 2 * r + 1
    return (c[n:, n:] - c[:-n, n:] - c[n:, :-n] + c[:-n, :-n]) / (n * n)


def run_variant(name, df, s):
    s = np.clip(s, 0.0, float(TOTAL - df))
    x = np.arange(W, dtype=np.float64)[None, :]
    pos = x - s
    p0 = np.floor(pos).astype(np.int64)
    frac = pos - p0
    p0c = np.clip(p0, 0, W - 1)
    p1c = np.clip(p0 + 1, 0, W - 1)
    rows = np.arange(H)[:, None]
    wright = (1 - frac) * right[rows, p0c] + frac * right[rows, p1c]
    cost_f = CostConfig(num_disparities=df, dtype="float32")
    fine = two_view_disparity(lj, jnp.asarray(wright.astype(np.float32)),
                              cost_f, sgm, backend="xla")
    d_f = np.asarray(fine.disparity)
    valid_f = np.asarray(fine.valid)
    df0 = np.clip(np.floor(d_f).astype(np.int64), 0, df - 1)
    fr = np.clip(d_f - df0, 0.0, 1.0)
    xs0 = np.clip(np.arange(W)[None, :] - df0, 0, W - 1)
    xs1 = np.clip(xs0 - 1, 0, W - 1)
    s_at = (1 - fr) * s[rows, xs0] + fr * s[rows, xs1]
    d_total = np.where(valid_f & (d_f >= 0), d_f + s_at, -1.0)
    score(name, d_total, valid_f)
    m = mask & valid_f & (d_f >= 0)
    print("   fine-index pct:", np.percentile(d_f[m], [1, 50, 99]).round(1))
    # residual-bad structure
    err = np.abs(d_total - gt)
    bad = m & (err > 2.0)
    if bad.sum():
        ce = np.abs(up - gt)
        print(f"   bad n={bad.sum()} err:", np.percentile(err[bad], [25,50,75,95]).round(1),
              " coarse_err:", np.percentile(ce[bad], [25,50,75,95]).round(1),
              " d_f:", np.percentile(d_f[bad], [10,50,90]).round(1))
        cols = np.where(bad.any(0))[0]
        runs = np.split(cols, np.where(np.diff(cols) > 2)[0] + 1)
        print("   bad col runs:", [(int(r[0]), len(r)) for r in runs][:14])
    # post-filter the DECODED map: residual bads are small blobs with
    # 2-5 px errors against correct neighbours
    from stereovisionarray_tpu.ops.postfilter import median3x3, speckle_filter
    dj = jnp.asarray(np.where(valid_f, d_total, -1.0).astype(np.float32))
    vj = jnp.asarray(valid_f)
    dm = median3x3(dj, vj)
    ds, vs = speckle_filter(dm, vj, max_diff=1.5, window=5, min_support=8)
    score(name + "+med+spk", np.asarray(ds), np.asarray(vs))
    ds2, vs2 = speckle_filter(dj, vj, max_diff=1.5, window=5, min_support=8)
    score(name + "+spk    ", np.asarray(ds2), np.asarray(vs2))
    return d_total, valid_f


gx = np.gradient(up, axis=1)
sig15 = np.clip(box2d(gx, 7), 0.0, 0.7)
sig25 = np.clip(box2d(gx, 12), 0.0, 0.7)

run_variant("df32 sig25 ", 32, up - 16.0 * (1.0 - sig25))


# ---- the PRODUCTION composition: g-matmul + 65-tap hat chain -----------
# s*(x,y) = g(x) + r(x,y): g = column mean (realized by ONE MXU hat-matrix
# matmul, any range), r clamped to [-32, 32] (65-tap hat chain, 0.14 ms on
# device). True composition of two smooth bilinear warps: no seams, no
# collisions; effective field computed EXACTLY by applying the same hat
# weights to (k + g(x-k)).
def run_composed(name, df, s_star):
    s_star = np.clip(s_star, 0.0, float(TOTAL - df))
    rows = np.arange(H)[:, None]
    x1 = np.arange(W, dtype=np.float64)

    g = s_star.mean(axis=0)                      # (W,) 1D column field
    gp = np.gradient(g)
    k = np.ones(9) / 9.0
    gp = np.clip(np.convolve(gp, k, mode="same"), -0.2, 0.7)

    r = np.clip((s_star - g[None, :]) / (1.0 - gp[None, :]), -32.0, 32.0)

    # stage 1: warp by g (production: MXU hat-matrix matmul; here exact)
    pos = np.clip(x1 - g, 0.0, W - 1)
    p0 = np.floor(pos).astype(np.int64)
    fr = pos - p0
    p1 = np.clip(p0 + 1, 0, W - 1)
    v1 = (1 - fr)[None, :] * right[:, p0] + fr[None, :] * right[:, p1]

    # stage 2: 65-tap hat chain by r; same weights on (k + g(x-k)) -> s_eff
    v3 = np.zeros_like(v1)
    s_eff = np.zeros_like(v1)
    for kk in range(-32, 33):
        w = np.maximum(0.0, 1.0 - np.abs(r - kk))
        idx = np.clip(np.arange(W) - kk, 0, W - 1)
        v3 += w * v1[:, idx]
        s_eff += w * (g[idx][None, :] + kk)

    cost_f = CostConfig(num_disparities=df, dtype="float32")
    fine = two_view_disparity(lj, jnp.asarray(v3.astype(np.float32)),
                              cost_f, sgm, backend="xla")
    d_f = np.asarray(fine.disparity)
    valid_f = np.asarray(fine.valid)
    df0 = np.clip(np.floor(d_f).astype(np.int64), 0, df - 1)
    frd = np.clip(d_f - df0, 0.0, 1.0)
    xs0 = np.clip(np.arange(W)[None, :] - df0, 0, W - 1)
    xs1 = np.clip(xs0 - 1, 0, W - 1)
    s_at = (1 - frd) * s_eff[rows, xs0] + frd * s_eff[rows, xs1]
    d_total = np.where(valid_f & (d_f >= 0), d_f + s_at, -1.0)
    score(name, d_total, valid_f)
    print("   |s_eff - s*| pct:",
          np.percentile(np.abs(s_eff - s_star), [50, 99, 99.9]).round(2))
    from stereovisionarray_tpu.ops.postfilter import median3x3, speckle_filter
    dj = jnp.asarray(np.where(valid_f, d_total, -1.0).astype(np.float32))
    vj = jnp.asarray(valid_f)
    dm = median3x3(dj, vj)
    ds, vs = speckle_filter(dm, vj, max_diff=1.5, window=5, min_support=8)
    score(name + "+med+spk", np.asarray(ds), np.asarray(vs))


run_composed("composed32 ", 32, up - 16.0 * (1.0 - sig25))
run_composed("composed40 ", 40, up - 20.0 * (1.0 - sig25))

"""Per-stage device timing of the cascade plane sweep vs its flat baseline.

The full-pipeline A/B (perf_cascade_sweep.py) measured cascade 3.09 vs flat
2.73 ms/set at (5x5, 270x360, 128->48 planes) — the opposite of the work
model (fine 0.375x sweep + coarse 0.125x). This probe times each cascade
stage in isolation, K frame-sets per dispatch via lax.map, scalar-reduce
fenced, to find where the model is wrong. Tunnel rules apply: only compare
numbers WITHIN one run.
"""

import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)

import jax

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from stereovisionarray_tpu.config import EngineConfig, SGMConfig
from stereovisionarray_tpu.datasets import (
    SceneSpec,
    reference_rig,
    render_camera_array,
)
from stereovisionarray_tpu.geometry.epipolar import inverse_depth_samples
from stereovisionarray_tpu.models.array_pipeline import _shift_warp_pad
from stereovisionarray_tpu.models.cascade_sweep import (
    _area_downsample,
    _pad_to_multiple,
    _scale_cameras,
    cascade_static_params,
)
from stereovisionarray_tpu.models.plane_sweep import (
    _shift_warp,
    _volume_to_maps,
    plane_sweep_depth,
    plane_sweep_volume,
    translation_shifts,
)
from stereovisionarray_tpu.ops.postfilter import fill_holes, median3x3, speckle_filter

ROWS = COLS = 5
H, W = 270, 360
PLANES, FINE, STEP, FACTOR = 128, 48, 8, 2
K = 8
REPEATS = 7

cams = reference_rig(rows=ROWS, cols=COLS, spacing=0.05, resolution=(H, W))
images, _ = render_camera_array(cams, (H, W), SceneSpec())
cfg = EngineConfig().override(**{
    "camera.rows": ROWS, "camera.cols": COLS,
    "plane_sweep.num_planes": PLANES, "plane_sweep.topology": "CROSS",
})
ps = cfg.plane_sweep
ref_index = 12
src_indices = (11, 13, 7, 17)
pad = _shift_warp_pad(cams, ref_index, src_indices, cfg)
bo, fp = cascade_static_params(cams, ref_index, src_indices, ps, FINE)
sgm = SGMConfig(p1=4.0, p2=32.0, num_paths=8, adaptive_p2=True)

import dataclasses

D_C = -(-(-(-PLANES // FACTOR)) // 8) * 8
cfg_c = dataclasses.replace(ps, num_planes=D_C)
cfg_f = dataclasses.replace(ps, num_planes=FINE)
N_BANDS = (PLANES - FINE) // STEP + 1


def timed(name, fn, x):
    jfn = jax.jit(lambda s: jnp.sum(jax.lax.map(fn, s)))
    for k in range(3):
        float(jfn(x + 0.1 * k))
    ts = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        float(jfn(x + 1.0 + 0.05 * i))
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{name:28s} {med / K * 1e3:8.3f} ms/set (K={K})", flush=True)
    return med / K


stack = jnp.asarray(np.stack([images] * K))  # (K, N, H, W)

# ---- flat baseline stages ----
def flat_full(imgs):
    out = plane_sweep_depth(imgs, cams, ref_index, src_indices, ps, sgm,
                            shift_pad=pad)
    return jnp.sum(out.depth)


def flat_volume(imgs):
    vol, nv, _ = plane_sweep_volume(imgs, cams, ref_index, src_indices, ps,
                                    shift_pad=pad)
    return jnp.sum(vol.astype(jnp.float32))


# ---- cascade stages ----
def coarse_full(imgs):
    imgs_p = _pad_to_multiple(imgs, FACTOR)
    out = plane_sweep_depth(
        _area_downsample(imgs_p, FACTOR), _scale_cameras(cams, FACTOR),
        ref_index, src_indices, cfg_c, sgm,
        shift_pad=-(-pad // FACTOR) + 2,
    )
    return jnp.sum(out.plane)


def coarse_post(imgs):
    # postfilter + resize on a synthetic plane map (same shapes)
    k = imgs[ref_index, :H // FACTOR, :W // FACTOR] % D_C
    v = k > 1.0
    k = median3x3(k, v)
    k, v = speckle_filter(k, v, max_diff=2.0)
    k, v = fill_holes(k, v, take="max")
    k = jnp.where(v, k, (D_C - 1) / 2.0)
    up = jax.image.resize(k * ((PLANES - 1) / (D_C - 1)), (H, W),
                          method="linear")
    return jnp.sum(up)


def prewarp(imgs):
    ref = imgs[ref_index]
    src_images = imgs[jnp.asarray(src_indices)]
    depths_full = inverse_depth_samples(ps.z_near, ps.z_far, PLANES)
    sh = translation_shifts(cams, ref_index, jnp.asarray(src_indices),
                            depths_full)
    a = sh[:, 0, :]
    c = (sh[:, PLANES - 1, :] - a) / (PLANES - 1)
    band = (ref.astype(jnp.int32) % N_BANDS)
    bv = jnp.broadcast_to(band, (4, H, W))
    p = pad + 1
    padded = jnp.pad(src_images, ((0, 0), (p, p), (p, p)))
    warp_one = jax.vmap(lambda q, o: _shift_warp(q, o[0], o[1], H, W, p))
    wsrc = jnp.zeros((4, H, W), jnp.float32)
    for b in range(N_BANDS):
        wsrc = wsrc + jnp.where(bv == b, warp_one(padded, a + c * (STEP * b)), 0.0)
    return jnp.sum(wsrc)


def fine_volume(imgs):
    ref = imgs[ref_index]
    src_images = imgs[jnp.asarray(src_indices)]
    depths_full = inverse_depth_samples(ps.z_near, ps.z_far, PLANES)
    sh = translation_shifts(cams, ref_index, jnp.asarray(src_indices),
                            depths_full)
    a = sh[:, 0, :]
    c = (sh[:, PLANES - 1, :] - a) / (PLANES - 1)
    j = jnp.arange(FINE, dtype=jnp.float32)
    fine_shifts = c[:, None, :] * j[None, :, None]
    vol, _, _ = plane_sweep_volume(
        jnp.concatenate([ref[None], src_images], axis=0), cams, 0,
        (1, 2, 3, 4), cfg_f, shift_pad=fp, depths=depths_full[:FINE],
        shifts=fine_shifts,
    )
    return jnp.sum(vol.astype(jnp.float32))


def fine_maps(imgs):
    ref = imgs[ref_index]
    src_images = imgs[jnp.asarray(src_indices)]
    depths_full = inverse_depth_samples(ps.z_near, ps.z_far, PLANES)
    sh = translation_shifts(cams, ref_index, jnp.asarray(src_indices),
                            depths_full)
    a = sh[:, 0, :]
    c = (sh[:, PLANES - 1, :] - a) / (PLANES - 1)
    j = jnp.arange(FINE, dtype=jnp.float32)
    fine_shifts = c[:, None, :] * j[None, :, None]
    vol, _, _ = plane_sweep_volume(
        jnp.concatenate([ref[None], src_images], axis=0), cams, 0,
        (1, 2, 3, 4), cfg_f, shift_pad=fp, depths=depths_full[:FINE],
        shifts=fine_shifts,
    )
    k, cost, conf, _ = _volume_to_maps(vol, ref, cfg_f, sgm, "auto")
    return jnp.sum(k) + jnp.sum(cost)


def full_cascade(imgs):
    from stereovisionarray_tpu.models.cascade_sweep import (
        cascade_plane_sweep_depth,
    )

    out = cascade_plane_sweep_depth(
        imgs, cams, ref_index, src_indices, ps, sgm, shift_pad=pad,
        coarse_factor=FACTOR, fine_planes=FINE, band_step=STEP,
        band_offsets=bo, fine_shift_pad=fp,
    )
    return jnp.sum(out.depth)


def timed_vmap(name, fn, x):
    """Same stage but batch-FOLDED: one vmapped program instead of a
    lax.map loop — at small shapes the per-op fixed cost amortizes over
    the batch (the opposite regime from probe_frame_batch's production-
    shape parity result)."""
    jfn = jax.jit(lambda s: jnp.sum(jax.vmap(fn)(s)))
    for k in range(3):
        float(jfn(x + 0.1 * k))
    ts = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        float(jfn(x + 1.0 + 0.05 * i))
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{name:28s} {med / K * 1e3:8.3f} ms/set (vmap K={K})", flush=True)
    return med / K


def prewarp_static(imgs):
    """Pre-warp with HOST-computed static shifts: static slices + lerp that
    XLA can fuse, instead of 4 dynamic_slice kernels per (band, view)."""
    src_images = imgs[jnp.asarray(src_indices)]
    depths_full = 1.0 / np.linspace(1.0 / ps.z_near, 1.0 / ps.z_far, PLANES)
    t = np.asarray(cams.t)
    fx = np.broadcast_to(np.asarray(cams.fx), (len(cams),))
    fy = np.broadcast_to(np.asarray(cams.fy), (len(cams),))
    band = (imgs[ref_index].astype(jnp.int32) % N_BANDS)
    bv = jnp.broadcast_to(band, (4, H, W))
    p = pad + 1
    padded = jnp.pad(src_images, ((0, 0), (p, p), (p, p)))
    wsrc = jnp.zeros((4, H, W), jnp.float32)
    step_inv = (1.0 / ps.z_far - 1.0 / ps.z_near) / (PLANES - 1)
    for b in range(N_BANDS):
        per_view = []
        for vi, s in enumerate(src_indices):
            # exact: su at plane q*b
            su = fx[s] * (t[s, 0] - t[ref_index, 0]) * (
                1.0 / ps.z_near + step_inv * STEP * b)
            sv = fy[s] * (t[s, 1] - t[ref_index, 1]) * (
                1.0 / ps.z_near + step_inv * STEP * b)
            j0, i0 = int(np.floor(sv)), int(np.floor(su))
            fv, fu = sv - j0, su - i0
            sl = lambda dy, dx: jax.lax.slice(
                padded[vi], (p + j0 + dy, p + i0 + dx),
                (p + j0 + dy + H, p + i0 + dx + W))
            top = sl(0, 0) * (1 - fu) + sl(0, 1) * fu
            bot = sl(1, 0) * (1 - fu) + sl(1, 1) * fu
            per_view.append(top * (1 - fv) + bot * fv)
        wsrc = wsrc + jnp.where(bv == b, jnp.stack(per_view), 0.0)
    return jnp.sum(wsrc)


def coarse_post_cheap(imgs):
    """median + window-5 speckle + fill + reshape-broadcast linear upsample
    (no jax.image.resize)."""
    k = imgs[ref_index, :H // FACTOR, :W // FACTOR] % D_C
    v = k > 1.0
    k = median3x3(k, v)
    k, v = speckle_filter(k, v, max_diff=2.0, window=5, min_support=8)
    k, v = fill_holes(k, v, take="max")
    k = jnp.where(v, k, (D_C - 1) / 2.0)
    k = k * ((PLANES - 1) / (D_C - 1))
    # nearest upsample by FACTOR via broadcast-reshape (band quantization
    # absorbs the sub-plane loss vs bilinear)
    up = jnp.broadcast_to(
        k[:, None, :, None], (H // FACTOR, FACTOR, W // FACTOR, FACTOR)
    ).reshape(H, W)
    return jnp.sum(up)


def main():
    print(f"backend {jax.default_backend()}  D={PLANES} Dc={D_C} Df={FINE} "
          f"bands={N_BANDS} pad={pad} fine_pad={fp}", flush=True)
    timed("flat_full", flat_full, stack)
    timed("flat_volume", flat_volume, stack)
    timed("cascade_full", full_cascade, stack)
    timed("coarse_full", coarse_full, stack)
    timed("coarse_post+resize", coarse_post, stack)
    timed("prewarp", prewarp, stack)
    timed("fine_volume", fine_volume, stack)
    timed("fine_volume+maps", fine_maps, stack)
    print("---- candidate fixes ----", flush=True)
    timed("prewarp_static", prewarp_static, stack)
    timed("coarse_post_cheap", coarse_post_cheap, stack)
    timed_vmap("coarse_full_vmap", coarse_full, stack)
    timed_vmap("cascade_full_vmap", full_cascade, stack)
    timed_vmap("fine_volume_vmap", fine_volume, stack)


if __name__ == "__main__":
    main()

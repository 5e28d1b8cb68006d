"""Round 2 of the cascade-sweep perf hunt (see probe_cascade_stages.py).

Findings so far at (5x5, 270x360): cascade_full 7.24 vs flat_full 9.52
ms/set (K=8 fenced absolutes — the B=1/3 slope that read cascade slower is
a thin-slope tunnel artifact); vmap folding and static-slice prewarp are
both neutral. Fitting F + D*c to the volume stage gives c ~= 42 us/plane
and F ~= 3 ms of PER-CALL fixed cost — this probe measures where F lives
(plane-count sweep at fixed shape) and whether coarse_factor=4 + leaner
coarse passes buy anything end to end.
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
import dataclasses

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
    cascade_plane_sweep_depth,
    cascade_static_params,
)
from stereovisionarray_tpu.models.plane_sweep import (
    plane_sweep_volume,
    translation_shifts,
)

ROWS = COLS = 5
H, W = 270, 360
PLANES = 128
K = 8
REPEATS = 7

cams = reference_rig(rows=ROWS, cols=COLS, spacing=0.05, resolution=(H, W))
images, depths_gt = render_camera_array(cams, (H, W), SceneSpec())
cfg = EngineConfig().override(**{
    "camera.rows": ROWS, "camera.cols": COLS,
    "plane_sweep.num_planes": PLANES, "plane_sweep.topology": "CROSS",
})
ps = cfg.plane_sweep
ref_index = 12
src_indices = (11, 13, 7, 17)
pad = _shift_warp_pad(cams, ref_index, src_indices, cfg)
sgm = SGMConfig(p1=4.0, p2=32.0, num_paths=8, adaptive_p2=True)
stack = jnp.asarray(np.stack([images] * K))


def timed(name, fn, x=stack):
    jfn = jax.jit(lambda s: jnp.sum(jax.lax.map(fn, s)))
    for k in range(3):
        float(jfn(x + 0.1 * k))
    ts = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        float(jfn(x + 1.0 + 0.05 * i))
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{name:34s} {med / K * 1e3:8.3f} ms/set", flush=True)
    return med / K


def volume_at(d_planes, use_pad):
    cfg_d = dataclasses.replace(ps, num_planes=d_planes)
    depths_full = inverse_depth_samples(ps.z_near, ps.z_far, PLANES)

    def fn(imgs):
        vol, _, _ = plane_sweep_volume(
            imgs, cams, ref_index, src_indices, cfg_d,
            shift_pad=use_pad, depths=depths_full[:d_planes],
        )
        return jnp.sum(vol.astype(jnp.float32))

    return fn


def cascade_at(factor, fine, coarse_sgm=True):
    bo, fp = cascade_static_params(cams, ref_index, src_indices, ps, fine)

    def fn(imgs):
        out = cascade_plane_sweep_depth(
            imgs, cams, ref_index, src_indices, ps,
            sgm,
            shift_pad=pad, coarse_factor=factor, fine_planes=fine,
            band_step=8, band_offsets=bo, fine_shift_pad=fp,
        )
        return jnp.sum(out.depth)

    return fn


def main():
    print(f"backend {jax.default_backend()} pad={pad}", flush=True)
    # fixed-cost fit: same full pad so only the plane count varies
    for d in (16, 32, 64, 128):
        timed(f"volume D={d} pad={pad}", volume_at(d, pad))
    # pad effect at fixed D
    timed("volume D=48 pad=11", volume_at(48, 11))
    timed("volume D=48 pad=48", volume_at(48, pad))
    # cascade variants
    for factor, fine in ((2, 48), (4, 48), (4, 32), (2, 64)):
        timed(f"cascade f{factor} df{fine}", cascade_at(factor, fine))

    # accuracy of the variants on the ray-traced rig (CPU-equivalent math)
    gt = depths_gt[ref_index]
    inner = np.zeros((H, W), bool)
    inner[8:-8, 8:-8] = True
    for factor, fine in ((2, 48), (4, 48), (4, 32)):
        bo, fp = cascade_static_params(cams, ref_index, src_indices, ps, fine)
        out = cascade_plane_sweep_depth(
            jnp.asarray(images), cams, ref_index, src_indices, ps, sgm,
            shift_pad=pad, coarse_factor=factor, fine_planes=fine,
            band_step=8, band_offsets=bo, fine_shift_pad=fp,
        )
        d, v = np.asarray(out.depth), np.asarray(out.valid)
        sel = v & inner
        rel = np.abs(d[sel] - gt[sel]) / gt[sel]
        print(f"acc f{factor} df{fine}: median {np.median(rel):.6f} "
              f"bad2 {(rel > 0.02).mean():.5f} valid {sel.sum()/inner.sum():.4f}",
              flush=True)


if __name__ == "__main__":
    main()

"""Per-stage device timing of the array pipeline (config 3 shape) on TPU.

Same slope method as perf_stages.py: each stage runs K times over varied
inputs inside one jitted lax.map, fenced with a scalar fetch; the per-call
cost is the slope between two K values (cancels tunnel dispatch latency).

Usage:  python scripts/perf_array_stages.py [--stage NAME]
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")

ROWS = COLS = 5
H, W, PLANES = 270, 360, 128
K_SMALL, K_BIG = 2, 6
REPEATS = 7


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--stage", default=None)
    parser.add_argument("--repeats", type=int, default=REPEATS)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from stereovisionarray_tpu.config import EngineConfig
    from stereovisionarray_tpu.datasets import SceneSpec, reference_rig, render_camera_array
    from stereovisionarray_tpu.geometry.topology import PairTopology, camera_pairs
    from stereovisionarray_tpu.models import array_depth_pipeline
    from stereovisionarray_tpu.models.array_pipeline import _shift_warp_pad, array_baselines
    from stereovisionarray_tpu.models.plane_sweep import plane_sweep_depth, plane_sweep_volume
    from stereovisionarray_tpu.models.two_view import depth_to_disparity
    from stereovisionarray_tpu.ops.refine import multiview_refine
    from stereovisionarray_tpu.ops.extract_pallas import extract_maps_hdw
    from stereovisionarray_tpu.ops.sgm_pallas import sgm_aggregate_pallas_hdw

    cams = reference_rig(rows=ROWS, cols=COLS, spacing=0.05, resolution=(H, W))
    images, _ = render_camera_array(cams, (H, W), SceneSpec())
    images = jnp.asarray(images)
    cfg = EngineConfig().override(**{
        "camera.rows": ROWS, "camera.cols": COLS,
        "plane_sweep.num_planes": PLANES, "plane_sweep.topology": "CROSS",
    })
    ref_index = (ROWS // 2) * COLS + COLS // 2
    pairs = camera_pairs(PairTopology(cfg.plane_sweep.topology), rows=ROWS, cols=COLS,
                         center=ref_index)
    src_indices = tuple(int(b) for a, b in pairs if a == ref_index) or tuple(
        int(b) for _, b in pairs)
    pad = _shift_warp_pad(cams, ref_index, src_indices, cfg)
    print(f"src views: {len(src_indices)}, shift_pad: {pad}")

    vol0, nv0, _ = plane_sweep_volume(images, cams, ref_index, src_indices,
                                      cfg.plane_sweep, shift_pad=pad)
    vol_hdw0 = jnp.moveaxis(vol0, -1, 1)
    baselines, b0 = array_baselines(cams, ref_index, src_indices)
    f_px = float(np.asarray(jnp.broadcast_to(cams.fx, (len(cams),)))[ref_index])
    sweep0 = plane_sweep_depth(images, cams, ref_index, src_indices,
                               cfg.plane_sweep, cfg.sgm, shift_pad=pad)
    disp0 = depth_to_disparity(sweep0.depth, b0, f_px)
    src_imgs = images[jnp.asarray(src_indices)]

    stages = {}

    def stage(name):
        def deco(f):
            stages[name] = f
            return f
        return deco

    @stage("sweep_volume")
    def _vol(s):
        v, nv, _ = plane_sweep_volume(images + s, cams, ref_index, src_indices,
                                      cfg.plane_sweep, shift_pad=pad)
        return jnp.sum(v) + jnp.sum(nv)

    from stereovisionarray_tpu.models.plane_sweep import translation_axis_flags

    _flags = translation_axis_flags(cams, ref_index, src_indices)

    import dataclasses as _dc

    _ps8 = _dc.replace(cfg.plane_sweep, sources_8bit=True)

    @stage("sweep_volume_8bit")
    def _vol8(s):
        v, nv, _ = plane_sweep_volume(images + s, cams, ref_index, src_indices,
                                      _ps8, shift_pad=pad)
        return jnp.sum(v) + jnp.sum(nv)

    @stage("sweep_volume_flagged")
    def _volf(s):
        v, nv, _ = plane_sweep_volume(images + s, cams, ref_index, src_indices,
                                      cfg.plane_sweep, shift_pad=pad,
                                      axis_flags=_flags)
        return jnp.sum(v) + jnp.sum(nv)

    @stage("sgm_extract")
    def _sgm(s):
        agg = sgm_aggregate_pallas_hdw(
            vol_hdw0 + s, p1=cfg.sgm.p1, p2=cfg.sgm.p2, num_paths=cfg.sgm.num_paths,
            image=images[ref_index], adaptive_p2=cfg.sgm.adaptive_p2,
            p2_min=cfg.sgm.p2_min)
        maps = extract_maps_hdw(agg, subpixel=True)
        return jnp.sum(maps.disparity) + jnp.sum(maps.cost)

    @stage("sweep_depth_full")
    def _sd(s):
        out = plane_sweep_depth(images + s, cams, ref_index, src_indices,
                                cfg.plane_sweep, cfg.sgm, shift_pad=pad)
        return jnp.sum(out.depth)

    d_ceiling = f_px * b0 / cfg.plane_sweep.z_near + abs(
        cfg.refine.radius * cfg.refine.step
    )

    @stage("refine")
    def _ref(s):
        out = multiview_refine(
            images[ref_index] + s, src_imgs, baselines, disp0,
            mask=sweep0.valid, radius=cfg.refine.radius, step=cfg.refine.step,
            window=cfg.refine.window, subpixel=cfg.refine.subpixel,
            max_disparity=d_ceiling)
        return jnp.sum(out.disparity)

    @stage("full_pipeline")
    def _full(s):
        out = array_depth_pipeline(images + s, cams, cfg)
        return jnp.sum(out.refined_depth)

    def run_k(f, k):
        @jax.jit
        def prog():
            salts = jnp.arange(1, k + 1, dtype=jnp.float32) * 0.25
            return jnp.sum(lax.map(f, salts))
        return prog

    selected = (
        {k: stages[k] for k in args.stage.split(",")} if args.stage else stages
    )
    print(f"{'stage':20s} {'ms/call':>9s}  (slope K={K_SMALL}->{K_BIG}, median of {args.repeats})")
    for name, f in selected.items():
        ps, pb = run_k(f, K_SMALL), run_k(f, K_BIG)
        float(ps()); float(pb())
        t_s, t_b = [], []
        for _ in range(args.repeats):
            t0 = time.perf_counter(); float(ps()); t_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(pb()); t_b.append(time.perf_counter() - t0)
        ms = (statistics.median(t_b) - statistics.median(t_s)) / (K_BIG - K_SMALL) * 1e3
        print(f"{name:20s} {ms:9.2f}")


if __name__ == "__main__":
    main()

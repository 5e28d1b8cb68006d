"""Within-run decomposition of the translation-only plane-sweep volume
(CROSS 4 views, 270x360, 128 planes — the array-pipeline hot stage).

Variants build successively more of the per-plane work so the deltas
isolate each component's device cost (same slope method as
perf_array_stages.py; only within-run deltas are trustworthy):

  warp         4 dynamic slices + bilinear lerp per (plane, view)
  warp_ok      + the out-of-view mask
  census       + census codes of the warped views (24 slice-compares)
  hamming      + XOR/popcount vs the reference codes + ceiling where
  full         + view fusion (mean) + nviews  == plane_sweep_volume
"""

import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
)

ROWS = COLS = 5
H, W, PLANES = 270, 360, 128
K_SMALL, K_BIG = 2, 6


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from stereovisionarray_tpu.config import EngineConfig
    from stereovisionarray_tpu.datasets import (
        SceneSpec, reference_rig, render_camera_array,
    )
    from stereovisionarray_tpu.geometry.topology import PairTopology, camera_pairs
    from stereovisionarray_tpu.models.array_pipeline import _shift_warp_pad
    from stereovisionarray_tpu.models.plane_sweep import (
        _chunked_plane_map,
        _shift_warp,
        inverse_depth_samples,
    )
    from stereovisionarray_tpu.ops.census import census_transform, hamming_distance

    cams = reference_rig(rows=ROWS, cols=COLS, spacing=0.05, resolution=(H, W))
    images, _ = render_camera_array(cams, (H, W), SceneSpec())
    images = jnp.asarray(images)
    cfg = EngineConfig().override(**{
        "camera.rows": ROWS, "camera.cols": COLS,
        "plane_sweep.num_planes": PLANES, "plane_sweep.topology": "CROSS",
    })
    ps = cfg.plane_sweep
    ref_index = (ROWS // 2) * COLS + COLS // 2
    pairs = camera_pairs(PairTopology(ps.topology), rows=ROWS, cols=COLS,
                         center=ref_index)
    src_indices = tuple(int(b) for a, b in pairs if a == ref_index)
    pad_b = _shift_warp_pad(cams, ref_index, src_indices, cfg)

    ref = images[ref_index]
    h, w = H, W
    depths = inverse_depth_samples(ps.z_near, ps.z_far, ps.num_planes)
    src = jnp.asarray(src_indices, dtype=jnp.int32)
    H_all = cams.fronto_plane_homography(ref_index, src, depths)
    shifts0 = H_all[..., :2, 2] / H_all[..., 2:3, 2]  # (S, D, 2)
    ref_census = census_transform(ref, (ps.patch, ps.patch))
    pad = pad_b + 1
    padded0 = jnp.pad(images[src], ((0, 0), (pad, pad), (pad, pad)))
    ceiling = jnp.asarray(ps.patch * ps.patch - 1, jnp.float32)
    v_iota = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u_iota = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def mk(level, dtype=jnp.float32):
        # dtype=bfloat16 casts only the PADDED SOURCE: the 4 window slices
        # (the materialization-bound part) move half the bytes; shift/floor
        # index math and the lerp stay f32 (bf16 cannot hold 48.xx shifts)
        def per_plane_closure(padded):
            padded = padded.astype(dtype)

            def per_plane(shift_d):
                def per_view(img_p, s_uv):
                    warped = _shift_warp(img_p, s_uv[0], s_uv[1], h, w, pad)
                    ok = (
                        (u_iota + s_uv[0] >= 0.0)
                        & (u_iota + s_uv[0] <= w - 1.0)
                        & (v_iota + s_uv[1] >= 0.0)
                        & (v_iota + s_uv[1] <= h - 1.0)
                    )
                    return warped, ok

                warped, ok = jax.vmap(per_view)(padded, shift_d)
                if level == "warp":
                    return jnp.sum(warped, axis=0)
                if level == "warp_ok":
                    return jnp.sum(jnp.where(ok, warped, 0.0), axis=0)
                wc = census_transform(warped, (ps.patch, ps.patch))
                if level == "census":
                    return jnp.sum(wc.astype(jnp.int32), axis=(0, -1)).astype(
                        jnp.float32
                    )
                c = hamming_distance(ref_census, wc)
                c = jnp.where(ok, c, ceiling)
                if level == "hamming":
                    return jnp.sum(c, axis=0)
                return jnp.mean(c, axis=0) + jnp.sum(ok, axis=0)  # "full"
            return per_plane

        def f(s):
            padded = padded0 + s
            out = _chunked_plane_map(
                per_plane_closure(padded), jnp.swapaxes(shifts0, 0, 1),
                ps.plane_chunk,
            )
            return jnp.sum(out)

        return f

    def run_k(f, k):
        @jax.jit
        def prog():
            salts = jnp.arange(1, k + 1, dtype=jnp.float32) * 0.25
            return jnp.sum(lax.map(f, salts))
        return prog

    print(f"{'level':14s} {'ms/call':>8s}")
    for level, dtype in (
        ("warp", jnp.float32),
        ("warp_ok", jnp.float32),
        ("census", jnp.float32),
        ("hamming", jnp.float32),
        ("full", jnp.float32),
        ("warp@bf16", jnp.bfloat16),
        ("full@bf16", jnp.bfloat16),
    ):
        f = mk(level.split("@")[0], dtype)
        psm, pbg = run_k(f, K_SMALL), run_k(f, K_BIG)
        float(psm()); float(pbg())
        t_s, t_b = [], []
        for _ in range(9):
            t0 = time.perf_counter(); float(psm()); t_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(pbg()); t_b.append(time.perf_counter() - t0)
        ms = (statistics.median(t_b) - statistics.median(t_s)) / (K_BIG - K_SMALL) * 1e3
        print(f"{level:14s} {ms:8.3f}", flush=True)


if __name__ == "__main__":
    main()

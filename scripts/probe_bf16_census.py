"""Probe: bfloat16 census comparisons in the plane-sweep volume.

The array-pipeline sweep is VPU-compute-bound in the 24-per-pixel census
comparisons (4 views x 128 planes x (5,5) windows); bf16 compares run at
2x the f32 lane rate on the VPU. Bilinear warp arithmetic and the
ok-mask iota math stay f32 (bf16 cannot represent integers > 256 exactly,
so coordinates/masks must not be cast) — only the census_transform INPUT
is rounded to bf16, changing codes solely where a neighbor-center
difference is below bf16 resolution (~0.5 gray levels at 8-bit range).

Measures: sweep_volume slope f32 vs bf16-census, plus plane-pick
agreement and refined-depth error drift on the golden rendered scene.
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
    from stereovisionarray_tpu.models import plane_sweep as ps_mod
    from stereovisionarray_tpu.models.array_pipeline import _shift_warp_pad
    from stereovisionarray_tpu.ops import census as census_mod

    cams = reference_rig(rows=ROWS, cols=COLS, spacing=0.05, resolution=(H, W))
    images, _ = render_camera_array(cams, (H, W), SceneSpec())
    images = jnp.asarray(images)
    cfg = EngineConfig().override(**{
        "camera.rows": ROWS, "camera.cols": COLS,
        "plane_sweep.num_planes": PLANES, "plane_sweep.topology": "CROSS",
    })
    ref_index = (ROWS // 2) * COLS + COLS // 2
    pairs = camera_pairs(PairTopology(cfg.plane_sweep.topology), rows=ROWS,
                         cols=COLS, center=ref_index)
    src_indices = tuple(int(b) for a, b in pairs if a == ref_index)
    pad = _shift_warp_pad(cams, ref_index, src_indices, cfg)

    orig_census = census_mod.census_transform

    def bf16_census(img, window):
        return orig_census(img.astype(jnp.bfloat16), window)

    def sweep(s):
        v, nv, _ = ps_mod.plane_sweep_volume(
            images + s, cams, ref_index, src_indices, cfg.plane_sweep,
            shift_pad=pad,
        )
        return v, nv

    def run_k(k):
        @jax.jit
        def prog():
            salts = jnp.arange(1, k + 1, dtype=jnp.float32) * 0.25
            return jnp.sum(lax.map(lambda s: jnp.sum(sweep(s)[0]), salts))
        return prog

    def measure(tag):
        jax.clear_caches()
        ps, pb = run_k(K_SMALL), run_k(K_BIG)
        float(ps()); float(pb())
        t_s, t_b = [], []
        for _ in range(9):
            t0 = time.perf_counter(); float(ps()); t_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); float(pb()); t_b.append(time.perf_counter() - t0)
        ms = (statistics.median(t_b) - statistics.median(t_s)) / (K_BIG - K_SMALL) * 1e3
        print(f"sweep_volume[{tag}]  {ms:7.3f} ms", flush=True)

    # accuracy: winning-plane agreement on the unsalted scene
    vol_f32 = np.asarray(sweep(0.0)[0])
    measure("f32")

    ps_mod.census_transform = bf16_census
    vol_bf = np.asarray(sweep(0.0)[0])
    measure("bf16-census")
    ps_mod.census_transform = orig_census

    k32 = vol_f32.argmin(-1)
    kbf = vol_bf.argmin(-1)
    agree = float((k32 == kbf).mean())
    near = float((np.abs(k32 - kbf) <= 1).mean())
    print(f"winning-plane agreement: exact {agree:.4f}, within-1 {near:.4f}")
    print(f"cost volume mean |diff|: {np.abs(vol_f32 - vol_bf).mean():.4f}")


if __name__ == "__main__":
    main()

"""Within-run A/B: in-kernel streaming top-k fusion vs the XLA chain at
the reference's TO_CENTER topology (24 source views, topk=6 — the library
DEFAULT fusion, which previously had NO kernel path and fell back to the
chunked XLA sweep).

K-fenced absolutes (K sets per lax.map dispatch), tunnel rules: trust only
the within-run ratio.
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

from stereovisionarray_tpu.config import EngineConfig
from stereovisionarray_tpu.datasets import (
    SceneSpec,
    reference_rig,
    render_camera_array,
)
from stereovisionarray_tpu.geometry.topology import PairTopology, camera_pairs
from stereovisionarray_tpu.models.array_pipeline import _shift_warp_pad
from stereovisionarray_tpu.models.plane_sweep import plane_sweep_volume

ROWS = COLS = 5
H, W, PLANES = 270, 360, 64
K = 6
REPEATS = 7

cams = reference_rig(rows=ROWS, cols=COLS, spacing=0.05, resolution=(H, W))
images, _ = render_camera_array(cams, (H, W), SceneSpec())
cfg = EngineConfig().override(**{
    "camera.rows": ROWS, "camera.cols": COLS,
    "plane_sweep.num_planes": PLANES,
    "plane_sweep.topology": "TO_CENTER",
    "plane_sweep.fusion": "topk_mean",
    "plane_sweep.topk": 6,
})
ref_index = 12
pairs = camera_pairs(PairTopology("TO_CENTER"), rows=ROWS, cols=COLS,
                     center=ref_index)
src_indices = tuple(int(b) for a, b in pairs if a == ref_index)
pad = _shift_warp_pad(cams, ref_index, src_indices, cfg)
stack = jnp.asarray(np.stack([images] * K))
print(f"sources={len(src_indices)} topk={cfg.plane_sweep.topk} pad={pad} "
      f"planes={PLANES}", flush=True)


def timed(name, backend):
    def one(imgs):
        vol, _, _ = plane_sweep_volume(
            imgs, cams, ref_index, src_indices, cfg.plane_sweep,
            shift_pad=pad, backend=backend,
        )
        return jnp.sum(vol.astype(jnp.float32))

    jfn = jax.jit(lambda s: jnp.sum(jax.lax.map(one, s)))
    for k in range(3):
        float(jfn(stack + 0.1 * k))
    ts = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        float(jfn(stack + 1.0 + 0.05 * i))
        ts.append(time.perf_counter() - t0)
    med = statistics.median(ts)
    print(f"{name:22s} {med / K * 1e3:8.3f} ms/set (K={K} absolutes, "
          f"~{3.0:.0f}ms of it dispatch share)", flush=True)
    return med / K


def main():
    # on-device parity of the fori-loop view path first (24 views > the
    # unroll threshold; integer fixture -> interior must be bit-exact)
    imgs = jnp.asarray(np.round(np.asarray(images)))
    vx, nx, _ = plane_sweep_volume(
        imgs, cams, ref_index, src_indices, cfg.plane_sweep,
        shift_pad=pad, backend="xla",
    )
    vp, npv, _ = plane_sweep_volume(
        imgs, cams, ref_index, src_indices, cfg.plane_sweep,
        shift_pad=pad, backend="pallas",
    )
    np.testing.assert_array_equal(np.asarray(npv), np.asarray(nx))
    m = cfg.plane_sweep.patch // 2
    inner = (slice(m, H - m), slice(m, W - m))
    d = np.abs(np.asarray(vp) - np.asarray(vx))
    assert d[inner].max() == 0.0, f"fori topk interior {d[inner].max()}"
    print("PASS 2D-grid 24-view topk kernel vs XLA: interior BIT-EXACT",
          flush=True)

    t_x = timed("topk24 xla chain", "xla")
    t_p = timed("topk24 kernel", "pallas")
    print(f"within-run ratio xla/kernel = {t_x / t_p:.2f}", flush=True)

    # ---- view-chunk sweep (VERDICT r4 item 3): G views resident/step ----
    from stereovisionarray_tpu.geometry.epipolar import inverse_depth_samples
    from stereovisionarray_tpu.models.plane_sweep import translation_shifts
    from stereovisionarray_tpu.ops.sweep_pallas import (
        plane_sweep_census_pallas,
    )

    src = jnp.asarray(src_indices, dtype=jnp.int32)
    depths = inverse_depth_samples(cfg.plane_sweep.z_near,
                                   cfg.plane_sweep.z_far, PLANES)
    sh = jnp.transpose(
        translation_shifts(cams, ref_index, src, depths), (1, 0, 2)
    )  # (D, S, 2)
    ref_img = imgs[ref_index]
    srcs = imgs[jnp.asarray(src_indices)]

    ref_out = None
    for g in (1, 2, 4, 6, 8):
        def one(x, g=g):
            f, nv = plane_sweep_census_pallas(
                x[0], x[1:], sh, patch=cfg.plane_sweep.patch, shift_pad=pad,
                topk=K, view_chunk=g,
            )
            return jnp.sum(f) + jnp.sum(nv.astype(jnp.float32))

        all_imgs = jnp.concatenate([ref_img[None], srcs], axis=0)
        batch = jnp.asarray(np.stack([np.asarray(all_imgs)] * 6))
        jfn = jax.jit(lambda s: jnp.sum(jax.lax.map(one, s)))
        for k in range(3):
            float(jfn(batch + 0.1 * k))
        ts = []
        for i in range(REPEATS):
            t0 = time.perf_counter()
            float(jfn(batch + 1.0 + 0.05 * i))
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts) / 6
        # exactness vs G=1
        f, nv = plane_sweep_census_pallas(
            ref_img, srcs, sh, patch=cfg.plane_sweep.patch, shift_pad=pad,
            topk=K, view_chunk=g,
        )
        if ref_out is None:
            ref_out = (np.asarray(f), np.asarray(nv))
            tag = "(ref)"
        else:
            df = np.abs(np.asarray(f) - ref_out[0]).max()
            dn = np.abs(np.asarray(nv) - ref_out[1]).max()
            tag = f"maxdiff {df:.1e}/{dn}"
        print(f"chunk G={g}: {med * 1e3:8.3f} ms/sweep {tag}", flush=True)


if __name__ == "__main__":
    main()

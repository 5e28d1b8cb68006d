"""On-device numeric parity of the compiled Pallas fast paths vs the XLA
oracles — catches Mosaic-lowering divergences that interpret-mode CPU
tests cannot (the kernels' only other coverage is interpret mode).

Checks, at production-class shapes on the real chip:
  1. two-view: backend="pallas" (fused WDH builder + sgm_extract_fused_wdh)
     vs backend="xla" — disparities within 0.5 px on >= 99% of pixels both
     mark valid (int16 quantization + float-order differences only).
  2. plane-sweep volume: the fused MXU sweep kernel vs the XLA chain —
     interior bit-level tolerance (<= 1 census bit), nviews exact.
  3. fused two-view extraction vs unfused aggregate+extract, both Pallas
     on-device — bit-identical for int16 costs.

Exits non-zero on failure; prints one PASS line per check.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"
)

import jax

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def check_two_view():
    from stereovisionarray_tpu.config import CostConfig, SGMConfig
    from stereovisionarray_tpu.models.two_view import two_view_disparity

    H, W, D = 540, 768, 64
    rng = np.random.default_rng(0)
    base = rng.uniform(0.0, 255.0, size=(H, W + 32)).astype(np.float32)
    left = jnp.asarray(base[:, :W])
    right = jnp.asarray(base[:, 32:])
    cc = CostConfig(num_disparities=D, census_window=(7, 9), dtype="int16")
    sc = SGMConfig(p1=8.0, p2=96.0, num_paths=8, adaptive_p2=True)
    fast = two_view_disparity(left, right, cc, sc, backend="pallas")
    oracle = two_view_disparity(left, right, cc, sc, backend="xla")
    vf, vo = np.asarray(fast.valid), np.asarray(oracle.valid)
    both = vf & vo
    close = (
        np.abs(np.asarray(fast.disparity) - np.asarray(oracle.disparity))[both]
        <= 0.5
    ).mean()
    assert close >= 0.99, f"two-view pallas-vs-xla within-0.5px: {close}"
    agree_valid = (vf == vo).mean()
    assert agree_valid >= 0.97, f"validity agreement {agree_valid}"
    print(f"PASS two_view pallas-vs-xla: within-0.5px {close:.4f}, "
          f"valid agree {agree_valid:.4f}")


def check_two_view_int8():
    """int8 cost volumes (cost_scale 1): (a) the compiled int8 pipeline vs
    the XLA float oracle within the same tolerance as int16, and (b) the
    int8 volume run through the fused SGM+extract kernels bit-identical to
    the SAME VALUES upcast to int16 (the math is dtype-independent once the
    stored values agree — this isolates Mosaic's i8 load/store lowering)."""
    from stereovisionarray_tpu.config import CostConfig, SGMConfig
    from stereovisionarray_tpu.models.two_view import two_view_disparity
    from stereovisionarray_tpu.ops.cost_pallas import (
        fused_cost_volume_pallas_wdh,
    )
    from stereovisionarray_tpu.ops.sgm_pallas import sgm_extract_fused_wdh

    H, W, D = 540, 768, 64
    rng = np.random.default_rng(2)
    base = rng.uniform(0.0, 255.0, size=(H, W + 32)).astype(np.float32)
    left = jnp.asarray(base[:, :W])
    right = jnp.asarray(base[:, 32:])
    cc = CostConfig(num_disparities=D, census_window=(7, 9), dtype="int8")
    sc = SGMConfig(p1=8.0, p2=96.0, num_paths=8, adaptive_p2=True)
    fast = two_view_disparity(left, right, cc, sc, backend="pallas")
    oracle = two_view_disparity(left, right, cc, sc, backend="xla")
    vf, vo = np.asarray(fast.valid), np.asarray(oracle.valid)
    both = vf & vo
    close = (
        np.abs(np.asarray(fast.disparity) - np.asarray(oracle.disparity))[both]
        <= 0.5
    ).mean()
    assert close >= 0.99, f"two-view int8 pallas-vs-xla within-0.5px: {close}"

    vol_t8 = fused_cost_volume_pallas_wdh(left, right, D, out_dtype="int8")
    vol8 = jnp.transpose(vol_t8, (2, 1, 0))
    kw = dict(p1=8, p2=96, num_paths=8, image=left, adaptive_p2=True,
              p2_min=24, subpixel=True, uniqueness=0.95, lr_max_diff=1.5)
    m8 = sgm_extract_fused_wdh(vol8, vol_t8, **kw)
    m16 = sgm_extract_fused_wdh(vol8.astype(jnp.int16),
                                vol_t8.astype(jnp.int16), **kw)
    np.testing.assert_array_equal(np.asarray(m8.valid), np.asarray(m16.valid))
    np.testing.assert_array_equal(np.asarray(m8.disparity),
                                  np.asarray(m16.disparity))
    print(f"PASS two_view int8: pallas-vs-xla within-0.5px {close:.4f}; "
          "int8 kernels bit-identical to int16-upcast (on-device)")


def check_fused_extraction_bit_exact():
    from stereovisionarray_tpu.ops.cost_pallas import (
        fused_cost_volume_pallas_wdh,
    )
    from stereovisionarray_tpu.ops.extract_pallas import extract_disparity_hdw
    from stereovisionarray_tpu.ops.sgm_pallas import (
        sgm_aggregate_pallas_hdw,
        sgm_extract_fused_wdh,
    )
    from stereovisionarray_tpu.ops.wta import INVALID_DISPARITY

    H, W, D = 540, 768, 64
    rng = np.random.default_rng(1)
    base = rng.uniform(0.0, 255.0, size=(H, W + 32)).astype(np.float32)
    l = jnp.asarray(base[:, :W])
    r = jnp.asarray(base[:, 32:])
    vol_t = fused_cost_volume_pallas_wdh(l, r, D, census_window=(7, 9))
    vol = jnp.transpose(vol_t, (2, 1, 0))
    kw = dict(p1=32, p2=384, num_paths=8, image=l, adaptive_p2=True,
              p2_min=96)
    agg = sgm_aggregate_pallas_hdw(vol, vol_t=vol_t, **kw)
    want = extract_disparity_hdw(agg, subpixel=True, uniqueness=0.95,
                                 lr_max_diff=1.5)
    got = sgm_extract_fused_wdh(vol, vol_t, subpixel=True, uniqueness=0.95,
                                lr_max_diff=1.5, **kw)
    gd = np.where(np.asarray(got.valid), np.asarray(got.disparity),
                  INVALID_DISPARITY)
    np.testing.assert_array_equal(np.asarray(want.valid),
                                  np.asarray(got.valid))
    np.testing.assert_array_equal(np.asarray(want.disparity), gd)
    print("PASS fused extraction bit-identical to aggregate+extract "
          "(540x768x64 int16, on-device)")


def check_seeded_sweep_relay():
    """The exact-tile-relay sweep variant (init_carry + emit_final,
    parallel/two_view._relay_sweep_pallas) compiled ON DEVICE: splitting a
    540-row volume into 4 seeded segments must reproduce the unsegmented
    stacked sweep bit for bit, both directions. (The interpret-mode test
    lives in tests/test_parallel.py; this catches Mosaic lowering issues
    in the new has_init/emit_final kernel branches.)"""
    from stereovisionarray_tpu.ops.sgm_pallas import _sweep_hdw_stacked

    H, D, W = 540, 64, 768
    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.integers(0, 280, (H, D, W)), jnp.int16)
    p2 = jnp.full((H, W), 384, jnp.int16)
    p1 = 32
    splits = [0, 132, 264, 396, 540]  # multiples of the 12-row block

    for reverse in (False, True):
        full = _sweep_hdw_stacked(vol, p2, p1, reverse, False)
        big = jnp.full((3 * D, W), 16000, jnp.int32)
        order = range(len(splits) - 1)
        if reverse:
            order = reversed(list(order))
        carry = big
        parts = {}
        for k in order:
            a, b = splits[k], splits[k + 1]
            rows, carry = _sweep_hdw_stacked(
                vol[a:b], p2[a:b], p1, reverse, False,
                init_carry=carry, emit_final=True,
            )
            parts[k] = rows
        relay = jnp.concatenate([parts[k] for k in range(len(splits) - 1)],
                                axis=0)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(relay))
    print("PASS seeded sweep relay bit-identical to unsegmented stacked "
          "sweep (540x768x64 int16, both directions, on-device)")


def check_plane_sweep_kernel():
    from stereovisionarray_tpu.config import EngineConfig
    from stereovisionarray_tpu.datasets import (
        SceneSpec, reference_rig, render_camera_array,
    )
    from stereovisionarray_tpu.geometry.topology import (
        PairTopology, camera_pairs,
    )
    from stereovisionarray_tpu.models.array_pipeline import _shift_warp_pad
    from stereovisionarray_tpu.models.plane_sweep import plane_sweep_volume

    ROWS = COLS = 5
    H, W, PLANES = 270, 360, 128
    cams = reference_rig(rows=ROWS, cols=COLS, spacing=0.05,
                         resolution=(H, W))
    images, _ = render_camera_array(cams, (H, W), SceneSpec())
    # quantize to gray levels: the kernel's hi/lo bf16 split is EXACT for
    # <= 16-significant-bit values (all uint8-sourced real data); raw float
    # renders add a 2^-16 warp residual that flips census bits at near-ties
    # in flat regions — meaningless bits, but they'd mask a real bug here
    images = jnp.asarray(np.round(np.asarray(images)))
    cfg = EngineConfig().override(**{
        "camera.rows": ROWS, "camera.cols": COLS,
        "plane_sweep.num_planes": PLANES, "plane_sweep.topology": "CROSS",
    })
    ref_index = (ROWS // 2) * COLS + COLS // 2
    pairs = camera_pairs(PairTopology("CROSS"), rows=ROWS, cols=COLS,
                         center=ref_index)
    src_indices = tuple(int(b) for a, b in pairs if a == ref_index)
    pad = _shift_warp_pad(cams, ref_index, src_indices, cfg)
    vol_x, nv_x, _ = plane_sweep_volume(
        images, cams, ref_index, src_indices, cfg.plane_sweep,
        shift_pad=pad, backend="xla",
    )
    m = cfg.plane_sweep.patch // 2
    inner = (slice(m, H - m), slice(m, W - m))
    # run BOTH kernel paths on device: the dynamic one-hot warp (no flags)
    # and the axis-flagged static-slice fast path (the CROSS rig flags
    # every view 'x' or 'y') — ADVICE r2: the flagged branches had only
    # ever executed in interpret mode, insufficient on a toolchain with
    # documented silent Mosaic miscompiles
    from stereovisionarray_tpu.models.plane_sweep import (
        translation_axis_flags,
    )

    import dataclasses

    flags = translation_axis_flags(cams, ref_index, src_indices)
    assert any(f in ("x", "y") for f in flags), flags
    ps8 = dataclasses.replace(cfg.plane_sweep, sources_8bit=True)
    for label, af, psc in (
        ("dynamic", (None,) * len(src_indices), cfg.plane_sweep),
        ("axis-flagged " + "".join(f or "-" for f in flags), flags,
         cfg.plane_sweep),
        # single-matmul-arm warp (decoded-8-bit sources): exact on the
        # rounded fixture, so the same bit-exact bar applies
        ("sources_8bit", (None,) * len(src_indices), ps8),
    ):
        vol_p, nv_p, _ = plane_sweep_volume(
            images, cams, ref_index, src_indices, psc,
            shift_pad=pad, backend="pallas", axis_flags=af,
        )
        np.testing.assert_array_equal(np.asarray(nv_p), np.asarray(nv_x))
        d = np.abs(np.asarray(vol_p) - np.asarray(vol_x))
        # integer images: the MXU gather is exact, so the interior must be
        # BIT-IDENTICAL (this caught a real Mosaic bug: in-kernel u32 census
        # packing silently dropped bits 16-18/20-22 on device)
        assert d[inner].max() == 0.0, f"{label} interior {d[inner].max()}"
        ki = np.asarray(vol_p).argmin(-1)[inner]
        kx = np.asarray(vol_x).argmin(-1)[inner]
        agree = (ki == kx).mean()
        assert agree == 1.0, f"{label} winning-plane agreement {agree}"
        print(f"PASS plane-sweep MXU kernel vs XLA [{label}] "
              f"(270x360x128, on-device): interior BIT-EXACT, "
              f"plane agree {agree:.4f}")

    # sub-S top-k fusion: the in-kernel streaming insertion sort vs the
    # XLA chain's -top_k(-costs) mean. Integer fixture -> both are means
    # of the same k integer hammings -> interior bit-exact.
    ps_tk = dataclasses.replace(cfg.plane_sweep, fusion="topk_mean", topk=2)
    vx, nx, _ = plane_sweep_volume(
        images, cams, ref_index, src_indices, ps_tk,
        shift_pad=pad, backend="xla",
    )
    vp, npv, _ = plane_sweep_volume(
        images, cams, ref_index, src_indices, ps_tk,
        shift_pad=pad, backend="pallas",
    )
    np.testing.assert_array_equal(np.asarray(npv), np.asarray(nx))
    d = np.abs(np.asarray(vp) - np.asarray(vx))
    assert d[inner].max() == 0.0, f"topk interior {d[inner].max()}"
    print("PASS plane-sweep MXU kernel vs XLA [topk 2-of-4] "
          "(270x360x128, on-device): interior BIT-EXACT")


def check_plane_sweep_depth_end_to_end():
    """Full config-3 pipeline (sweep + 128-plane SGM + subpixel plane) both
    backends on device — exercises the packed WTA and fused RL extraction
    at D=128 (the two-view checks cover D=64)."""
    from stereovisionarray_tpu.config import EngineConfig, SGMConfig
    from stereovisionarray_tpu.datasets import (
        SceneSpec, reference_rig, render_camera_array,
    )
    from stereovisionarray_tpu.geometry.topology import (
        PairTopology, camera_pairs,
    )
    from stereovisionarray_tpu.models.array_pipeline import _shift_warp_pad
    from stereovisionarray_tpu.models.plane_sweep import plane_sweep_depth

    ROWS = COLS = 5
    H, W, PLANES = 270, 360, 128
    cams = reference_rig(rows=ROWS, cols=COLS, spacing=0.05,
                         resolution=(H, W))
    images, _ = render_camera_array(cams, (H, W), SceneSpec())
    images = jnp.asarray(np.round(np.asarray(images)))
    cfg = EngineConfig().override(**{
        "camera.rows": ROWS, "camera.cols": COLS,
        "plane_sweep.num_planes": PLANES, "plane_sweep.topology": "CROSS",
    })
    ref_index = (ROWS // 2) * COLS + COLS // 2
    pairs = camera_pairs(PairTopology("CROSS"), rows=ROWS, cols=COLS,
                         center=ref_index)
    src_indices = tuple(int(b) for a, b in pairs if a == ref_index)
    pad = _shift_warp_pad(cams, ref_index, src_indices, cfg)
    from stereovisionarray_tpu.models.plane_sweep import (
        translation_axis_flags,
    )

    sgm = SGMConfig(p1=4.0, p2=32.0, num_paths=8, adaptive_p2=True)
    out_p = plane_sweep_depth(images, cams, ref_index, src_indices,
                              cfg.plane_sweep, sgm, shift_pad=pad,
                              backend="pallas",
                              axis_flags=translation_axis_flags(
                                  cams, ref_index, src_indices))
    out_x = plane_sweep_depth(images, cams, ref_index, src_indices,
                              cfg.plane_sweep, sgm, shift_pad=pad,
                              backend="xla")
    both = np.asarray(out_p.valid) & np.asarray(out_x.valid)
    rel = (
        np.abs(np.asarray(out_p.depth) - np.asarray(out_x.depth))[both]
        / np.maximum(np.asarray(out_x.depth)[both], 1e-6)
    )
    med = float(np.median(rel))
    close = float((rel < 0.02).mean())
    # int16 fixed-point SGM vs float SGM + border-ring costs: tolerance,
    # not exactness — but the medians must be tight
    assert med < 1e-3, f"median rel depth diff {med}"
    assert close > 0.97, f"within-2% fraction {close}"
    print(f"PASS plane-sweep depth end-to-end pallas-vs-xla (D=128): "
          f"median rel {med:.2e}, within-2% {close:.4f}")


def check_cascade_sweep_end_to_end():
    """Cascade plane sweep both backends on device: the fine pass feeds the
    fused MXU sweep kernel EXPLICIT residual shifts (positive and negative,
    not camera-derived) and the coarse pass runs it at 68x90 — input
    patterns no other on-device check exercises."""
    from stereovisionarray_tpu.config import EngineConfig, SGMConfig
    from stereovisionarray_tpu.datasets import (
        SceneSpec, reference_rig, render_camera_array,
    )
    from stereovisionarray_tpu.geometry.topology import (
        PairTopology, camera_pairs,
    )
    from stereovisionarray_tpu.models.array_pipeline import _shift_warp_pad
    from stereovisionarray_tpu.models.cascade_sweep import (
        cascade_plane_sweep_depth, cascade_static_params,
    )

    ROWS = COLS = 5
    H, W, PLANES = 270, 360, 128
    cams = reference_rig(rows=ROWS, cols=COLS, spacing=0.05,
                         resolution=(H, W))
    images, _ = render_camera_array(cams, (H, W), SceneSpec())
    images = jnp.asarray(np.round(np.asarray(images)))
    cfg = EngineConfig().override(**{
        "camera.rows": ROWS, "camera.cols": COLS,
        "plane_sweep.num_planes": PLANES, "plane_sweep.topology": "CROSS",
    })
    ref_index = (ROWS // 2) * COLS + COLS // 2
    pairs = camera_pairs(PairTopology("CROSS"), rows=ROWS, cols=COLS,
                         center=ref_index)
    src_indices = tuple(int(b) for a, b in pairs if a == ref_index)
    pad = _shift_warp_pad(cams, ref_index, src_indices, cfg)
    bo, fp = cascade_static_params(cams, ref_index, src_indices,
                                   cfg.plane_sweep, 48)
    sgm = SGMConfig(p1=4.0, p2=32.0, num_paths=8, adaptive_p2=True)

    def run(backend):
        return cascade_plane_sweep_depth(
            images, cams, ref_index, src_indices, cfg.plane_sweep, sgm,
            shift_pad=pad, coarse_factor=4, fine_planes=48, band_step=8,
            band_offsets=bo, backend=backend,
        )

    out_p, out_x = run("pallas"), run("xla")
    both = np.asarray(out_p.valid) & np.asarray(out_x.valid)
    rel = (
        np.abs(np.asarray(out_p.depth) - np.asarray(out_x.depth))[both]
        / np.maximum(np.asarray(out_x.depth)[both], 1e-6)
    )
    med = float(np.median(rel))
    close = float((rel < 0.02).mean())
    # both levels quantize/aggregate independently and the band fields may
    # flip at coarse near-ties — medians must still be tight
    assert med < 1e-3, f"median rel depth diff {med}"
    assert close > 0.95, f"within-2% fraction {close}"
    print(f"PASS cascade sweep end-to-end pallas-vs-xla (128->48 planes): "
          f"median rel {med:.2e}, within-2% {close:.4f}")


def check_hat_sample():
    """hat_sample (smooth-cascade warp/decode kernel) compiled vs
    interpret on device — static lane-slice taps are simple, but this
    toolchain has silently miscompiled simple-looking kernels before."""
    from stereovisionarray_tpu.ops.hatsample import hat_sample

    rng = np.random.default_rng(17)
    h, w = 540, 768
    vals = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    t = jnp.asarray(rng.uniform(-46, 46, (h, w)).astype(np.float32))
    aux = jnp.asarray(rng.uniform(0, 200, (w,)).astype(np.float32))
    got, gaux = hat_sample(vals, t, -44, 44, aux=aux, interpret=False)
    ref, raux = hat_sample(vals, t, -44, 44, aux=aux, interpret=True)
    d = float(jnp.max(jnp.abs(got - ref)))
    da = float(jnp.max(jnp.abs(gaux - raux)))
    assert d < 1e-2 and da < 1e-2, (d, da)
    # decode-style positive tap range
    t2 = jnp.asarray(rng.uniform(0, 31, (h, w)).astype(np.float32))
    g2 = hat_sample(vals, t2, 0, 31, interpret=False)
    r2 = hat_sample(vals, t2, 0, 31, interpret=True)
    d2 = float(jnp.max(jnp.abs(g2 - r2)))
    assert d2 < 1e-2, d2
    print(f"PASS hat_sample compiled vs interpret (540x768, 89+32 taps): "
          f"max |d| {max(d, da, d2):.2e}")


def check_topk_grid_many_view():
    """TO_CENTER 24-source in-kernel topk (the 2D-grid variant,
    ops/sweep_pallas.py::_sweep_kernel_grid_views) vs the XLA chain —
    ADVICE r4: this path was only covered by a one-off probe; a Mosaic
    regression (SMEM-streamed scalars, scratch emit) would have slipped
    the standing gate."""
    import dataclasses

    from stereovisionarray_tpu.config import EngineConfig
    from stereovisionarray_tpu.datasets import (
        SceneSpec, reference_rig, render_camera_array,
    )
    from stereovisionarray_tpu.geometry.topology import (
        PairTopology, camera_pairs,
    )
    from stereovisionarray_tpu.models.array_pipeline import _shift_warp_pad
    from stereovisionarray_tpu.models.plane_sweep import plane_sweep_volume

    ROWS = COLS = 5
    H, W, PLANES = 270, 360, 64
    cams = reference_rig(rows=ROWS, cols=COLS, spacing=0.05,
                         resolution=(H, W))
    images, _ = render_camera_array(cams, (H, W), SceneSpec())
    images = jnp.asarray(np.round(np.asarray(images)))
    cfg = EngineConfig().override(**{
        "camera.rows": ROWS, "camera.cols": COLS,
        "plane_sweep.num_planes": PLANES,
        "plane_sweep.topology": "TO_CENTER",
        "plane_sweep.fusion": "topk_mean", "plane_sweep.topk": 6,
    })
    ref_index = (ROWS // 2) * COLS + COLS // 2
    pairs = camera_pairs(PairTopology("TO_CENTER"), rows=ROWS, cols=COLS,
                         center=ref_index)
    src_indices = tuple(int(b) for a, b in pairs if a == ref_index)
    assert len(src_indices) == 24, src_indices
    pad = _shift_warp_pad(cams, ref_index, src_indices, cfg)
    vol_x, nv_x, _ = plane_sweep_volume(
        images, cams, ref_index, src_indices, cfg.plane_sweep,
        shift_pad=pad, backend="xla",
    )
    vol_p, nv_p, _ = plane_sweep_volume(
        images, cams, ref_index, src_indices, cfg.plane_sweep,
        shift_pad=pad, backend="pallas",
    )
    np.testing.assert_array_equal(np.asarray(nv_p), np.asarray(nv_x))
    m = cfg.plane_sweep.patch // 2
    inner = (slice(m, H - m), slice(m, W - m))
    d = np.abs(np.asarray(vol_p) - np.asarray(vol_x))
    assert d[inner].max() == 0.0, f"grid topk interior {d[inner].max()}"
    print("PASS many-view 2D-grid topk kernel vs XLA [TO_CENTER 6-of-24] "
          "(270x360x64, on-device): interior BIT-EXACT")


def main():
    print(f"backend: {jax.default_backend()}")
    check_two_view()
    check_two_view_int8()
    check_seeded_sweep_relay()
    check_fused_extraction_bit_exact()
    check_plane_sweep_kernel()
    check_plane_sweep_depth_end_to_end()
    check_cascade_sweep_end_to_end()
    check_hat_sample()
    check_topk_grid_many_view()
    print("ALL TPU PARITY CHECKS PASS")


if __name__ == "__main__":
    main()

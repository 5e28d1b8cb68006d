"""Pallas SGM sweep kernels vs the XLA-scan aggregation (interpret mode on
the CPU backend — SURVEY.md §5 'Pallas interpret-mode for kernel
correctness')."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereovisionarray_tpu.ops.sgm import sgm_aggregate, sgm_aggregate_reference
from stereovisionarray_tpu.ops.sgm_pallas import sgm_aggregate_pallas


@pytest.fixture(scope="module")
def vol_img(rng=None):
    r = np.random.default_rng(3)
    vol = jnp.asarray(r.uniform(0, 60, (24, 32, 16)).astype(np.float32))
    img = jnp.asarray(r.uniform(0, 255, (24, 32)).astype(np.float32))
    return vol, img


class TestPallasSGM:
    @pytest.mark.parametrize("num_paths", [4, 8])
    @pytest.mark.parametrize("adaptive", [False, True])
    def test_matches_xla_scan(self, vol_img, num_paths, adaptive):
        vol, img = vol_img
        a = sgm_aggregate(vol, 4.0, 32.0, num_paths, img, adaptive, 8.0)
        b = sgm_aggregate_pallas(
            vol, 4.0, 32.0, num_paths, img, adaptive, 8.0, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-3
        )

    def test_matches_numpy_oracle(self, vol_img):
        """Direct check against the per-pixel dynamic-program oracle."""
        vol, _ = vol_img
        small = vol[:10, :12, :8]
        ref = sgm_aggregate_reference(np.asarray(small), 4.0, 32.0, num_paths=8)
        got = sgm_aggregate_pallas(small, 4.0, 32.0, 8, interpret=True)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-3)

    def test_nonsquare_and_odd_shapes(self):
        r = np.random.default_rng(5)
        for shape in [(7, 33, 16), (16, 7, 8), (9, 9, 8)]:
            vol = jnp.asarray(r.uniform(0, 30, shape).astype(np.float32))
            a = sgm_aggregate(vol, 2.0, 16.0, 8)
            b = sgm_aggregate_pallas(vol, 2.0, 16.0, 8, interpret=True)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-3
            )


class TestHdwFastPath:
    """(H, D, W)-layout sweeps + fused extraction (the TPU fast path)."""

    @pytest.mark.parametrize("num_paths", [4, 8])
    @pytest.mark.parametrize("adaptive", [False, True])
    def test_hdw_sweeps_match_xla(self, vol_img, num_paths, adaptive):
        from stereovisionarray_tpu.ops.sgm_pallas import sgm_aggregate_pallas_hdw

        vol, img = vol_img
        want = sgm_aggregate(vol, 4.0, 32.0, num_paths, img, adaptive, 8.0)
        got = sgm_aggregate_pallas_hdw(
            jnp.moveaxis(vol, -1, 1), 4.0, 32.0, num_paths, img, adaptive, 8.0,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(jnp.moveaxis(got, 1, -1)), np.asarray(want),
            rtol=1e-5, atol=1e-3,
        )

    def test_fused_extraction_matches_xla_interior(self):
        """extract_disparity_hdw == right_from_left + disparity_from_volume
        away from the right border (where the Pallas path deliberately uses
        out-of-image=BIG instead of edge clamping)."""
        from stereovisionarray_tpu.ops.cost_volume import (
            fused_cost_volume,
            right_from_left_volume,
        )
        from stereovisionarray_tpu.ops.extract_pallas import extract_disparity_hdw
        from stereovisionarray_tpu.ops.wta import disparity_from_volume

        r = np.random.default_rng(0)
        b = r.uniform(0, 255, (44, 96)).astype(np.float32)  # H ragged vs 8-row blocks
        l = jnp.asarray(b[:, :80])
        rt = jnp.asarray(b[:, 16:])
        D = 16
        vol = fused_cost_volume(l, rt, D)
        agg = sgm_aggregate(vol, 8.0, 96.0, 4, l, True, 24.0)
        want = disparity_from_volume(
            agg, vol_right=right_from_left_volume(agg), subpixel=True,
            uniqueness=0.95, lr_max_diff=1.25,
        )
        got = extract_disparity_hdw(
            jnp.moveaxis(agg, -1, 1), subpixel=True, uniqueness=0.95,
            lr_max_diff=1.25, interpret=True,
        )
        inner = np.s_[:, : 80 - D]
        vw = np.asarray(want.valid)[inner]
        vg = np.asarray(got.valid)[inner]
        assert (vw == vg).all()
        both = vw & vg
        np.testing.assert_allclose(
            np.asarray(want.disparity)[inner][both],
            np.asarray(got.disparity)[inner][both],
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(want.cost), np.asarray(got.cost), atol=1e-3
        )

    def test_two_view_backend_equivalence(self):
        """two_view_disparity(backend=pallas_interpret) reproduces the XLA
        backend's disparity away from the right border."""
        from stereovisionarray_tpu.config import CostConfig, SGMConfig
        from stereovisionarray_tpu.models import two_view_disparity

        r = np.random.default_rng(5)
        base = r.uniform(0, 255, (40, 88)).astype(np.float32)
        l = jnp.asarray(base[:, :72])
        rt = jnp.asarray(base[:, 16:])
        cc = CostConfig(num_disparities=16, census_window=(5, 5), dtype="float32")
        sc = SGMConfig(num_paths=8, uniqueness=0.95, lr_max_diff=1.25)
        a = two_view_disparity(l, rt, cc, sc, backend="xla")
        b = two_view_disparity(l, rt, cc, sc, backend="pallas_interpret")
        inner = np.s_[:, : 72 - 16]
        va, vb = np.asarray(a.valid)[inner], np.asarray(b.valid)[inner]
        assert (va == vb).all()
        both = va & vb
        np.testing.assert_allclose(
            np.asarray(a.disparity)[inner][both],
            np.asarray(b.disparity)[inner][both],
            atol=1e-4,
        )

    def test_hdw_cost_volume_layout(self):
        from stereovisionarray_tpu.ops.cost_volume import fused_cost_volume

        r = np.random.default_rng(1)
        b = r.uniform(0, 255, (16, 40)).astype(np.float32)
        l = jnp.asarray(b[:, :32])
        rt = jnp.asarray(b[:, 8:])
        a = fused_cost_volume(l, rt, 8)
        c = fused_cost_volume(l, rt, 8, layout="hdw")
        np.testing.assert_array_equal(
            np.asarray(jnp.moveaxis(c, 1, -1)), np.asarray(a)
        )


    def test_int16_costs_match_f32_within_quantization(self):
        """The default int16 fixed-point cost mode (scale 4) tracks the f32
        pipeline to sub-0.05 px on valid pixels."""
        from stereovisionarray_tpu.config import CostConfig, SGMConfig
        from stereovisionarray_tpu.models import two_view_disparity

        r = np.random.default_rng(5)
        base = r.uniform(0, 255, (40, 88)).astype(np.float32)
        l = jnp.asarray(base[:, :72])
        rt = jnp.asarray(base[:, 16:])
        sc = SGMConfig(num_paths=8, uniqueness=0.95, lr_max_diff=1.25)
        a = two_view_disparity(
            l, rt, CostConfig(num_disparities=16, census_window=(5, 5),
                              dtype="float32"), sc, backend="pallas_interpret")
        b = two_view_disparity(
            l, rt, CostConfig(num_disparities=16, census_window=(5, 5),
                              dtype="int16"), sc, backend="pallas_interpret")
        inner = np.s_[:, : 72 - 16]
        va, vb = np.asarray(a.valid)[inner], np.asarray(b.valid)[inner]
        assert (va == vb).mean() > 0.98
        both = va & vb
        d = np.abs(np.asarray(a.disparity)[inner][both]
                   - np.asarray(b.disparity)[inner][both])
        assert d.max() < 0.05 and d.mean() < 0.005

    def test_int8_costs_exact_and_close_to_int16(self):
        """int8 cost volumes (VERDICT r2 item 1: HALF the raw-volume HBM
        traffic): (a) the int8 builder equals the XLA int8 reference bit
        for bit; (b) the fused SGM+extract pipeline on the int8 volume is
        BIT-IDENTICAL to the same values upcast to int16 (the kernels
        compute in i32 either way — this isolates the i8 load/store
        lowering); (c) end-to-end int8 (cost scale 1) tracks int16 (scale
        4) to sub-0.1 px on valid pixels."""
        from stereovisionarray_tpu.config import CostConfig, SGMConfig
        from stereovisionarray_tpu.models import two_view_disparity
        from stereovisionarray_tpu.ops.cost_pallas import (
            fused_cost_volume_pallas_wdh,
        )
        from stereovisionarray_tpu.ops.cost_volume import fused_cost_volume
        from stereovisionarray_tpu.ops.sgm_pallas import sgm_extract_fused_wdh

        r = np.random.default_rng(6)
        base = r.uniform(0, 255, (40, 88)).astype(np.float32)
        l = jnp.asarray(base[:, :72])
        rt = jnp.asarray(base[:, 16:])
        D = 16
        v8_t = fused_cost_volume_pallas_wdh(
            l, rt, D, census_window=(5, 5), block_rows=8, interpret=True,
            out_dtype="int8",
        )
        ref8 = fused_cost_volume(l, rt, D, census_window=(5, 5),
                                 dtype=jnp.int8, layout="hdw")
        v8 = jnp.transpose(v8_t, (2, 1, 0))
        np.testing.assert_array_equal(np.asarray(v8), np.asarray(ref8))

        kw = dict(p1=8, p2=96, num_paths=8, subpixel=True, uniqueness=0.95,
                  lr_max_diff=1.25, interpret=True)
        m8 = sgm_extract_fused_wdh(v8, v8_t, **kw)
        m16 = sgm_extract_fused_wdh(v8.astype(jnp.int16),
                                    v8_t.astype(jnp.int16), **kw)
        np.testing.assert_array_equal(np.asarray(m8.disparity),
                                      np.asarray(m16.disparity))
        np.testing.assert_array_equal(np.asarray(m8.valid),
                                      np.asarray(m16.valid))

        sc = SGMConfig(num_paths=8, uniqueness=0.95, lr_max_diff=1.25)
        a = two_view_disparity(
            l, rt, CostConfig(num_disparities=D, census_window=(5, 5),
                              dtype="int16"), sc, backend="pallas_interpret")
        b = two_view_disparity(
            l, rt, CostConfig(num_disparities=D, census_window=(5, 5),
                              dtype="int8"), sc, backend="pallas_interpret")
        inner = np.s_[:, : 72 - 16]
        va, vb = np.asarray(a.valid)[inner], np.asarray(b.valid)[inner]
        # scale-1 quantization flips uniqueness-ratio decisions near the
        # threshold slightly more often than scale 4 does
        assert (va == vb).mean() > 0.97
        both = va & vb
        d = np.abs(np.asarray(a.disparity)[inner][both]
                   - np.asarray(b.disparity)[inner][both])
        # the coarser quantization may flip the integer winner between
        # adjacent planes on ambiguous random-noise pixels (isolated
        # ~0.5 px jumps) — bound the tail, not the max
        assert d.mean() < 0.01 and (d > 0.25).mean() < 0.005

    def test_pallas_cost_builder_bit_exact(self):
        """fused_cost_volume_pallas_hdw == the XLA int16 builder, bit for
        bit (including the x < d out-of-image mask and ragged row blocks)."""
        from stereovisionarray_tpu.ops.cost_pallas import fused_cost_volume_pallas_hdw
        from stereovisionarray_tpu.ops.cost_volume import fused_cost_volume

        r = np.random.default_rng(0)
        b = r.uniform(0, 255, (44, 96)).astype(np.float32)
        l = jnp.asarray(b[:, :80])
        rt = jnp.asarray(b[:, 16:])
        # 12: non-power-of-two D — exercises the barrel's round-up-and-slice
        # doubling plus the single-row roll that supplies the up[D-1] bound
        for D in (12, 16, 32):
            want = np.asarray(fused_cost_volume(
                l, rt, D, census_window=(5, 5), dtype=jnp.int16, layout="hdw"))
            got = np.asarray(fused_cost_volume_pallas_hdw(
                l, rt, D, census_window=(5, 5), interpret=True))
            np.testing.assert_array_equal(got, want)

    def test_pallas_wdh_builder_matches_hdw_transpose(self):
        """The roll-free (W, D, H) builder is the exact transpose of the
        (H, D, W) builder (same int16 costs, zero lane rolls)."""
        from stereovisionarray_tpu.ops.cost_pallas import (
            fused_cost_volume_pallas_hdw,
            fused_cost_volume_pallas_wdh,
        )

        r = np.random.default_rng(0)
        b = r.uniform(0, 255, (44, 96)).astype(np.float32)
        l = jnp.asarray(b[:, :80])
        rt = jnp.asarray(b[:, 16:])
        for D, bw in ((12, 0.25), (16, 0.0), (32, 0.25)):
            hdw = np.asarray(fused_cost_volume_pallas_hdw(
                l, rt, D, census_window=(5, 5), bt_weight=bw, interpret=True))
            wdh = np.asarray(fused_cost_volume_pallas_wdh(
                l, rt, D, census_window=(5, 5), bt_weight=bw, block_rows=8,
                interpret=True))
            np.testing.assert_array_equal(wdh, hdw.transpose(2, 1, 0))

    @pytest.mark.parametrize("num_paths", [4, 8])
    def test_fused_sweep_extract_bit_exact(self, num_paths):
        """sgm_extract_fused_hdw (extraction fused into the final up-sweep,
        no aggregated-volume HBM round trip) is bit-identical to
        sgm_aggregate_pallas_hdw + extract_disparity_hdw for integer costs,
        with and without a directly-built (W, D, H) twin volume."""
        from stereovisionarray_tpu.ops.cost_pallas import (
            fused_cost_volume_pallas_hdw,
            fused_cost_volume_pallas_wdh,
        )
        from stereovisionarray_tpu.ops.extract_pallas import extract_disparity_hdw
        from stereovisionarray_tpu.ops.sgm_pallas import (
            sgm_aggregate_pallas_hdw,
            sgm_extract_fused_hdw,
        )
        from stereovisionarray_tpu.ops.wta import INVALID_DISPARITY

        r = np.random.default_rng(7)
        b = r.uniform(0, 255, (44, 96)).astype(np.float32)
        l = jnp.asarray(b[:, :80])
        rt = jnp.asarray(b[:, 16:])
        D = 16
        vol = fused_cost_volume_pallas_hdw(l, rt, D, census_window=(5, 5),
                                           interpret=True)
        vol_t = fused_cost_volume_pallas_wdh(l, rt, D, census_window=(5, 5),
                                             block_rows=8, interpret=True)
        agg = sgm_aggregate_pallas_hdw(
            vol, p1=32, p2=384, num_paths=num_paths, image=l,
            adaptive_p2=True, p2_min=96, interpret=True)
        want = extract_disparity_hdw(
            agg, subpixel=True, uniqueness=0.95, lr_max_diff=1.5,
            interpret=True)
        for vt in (vol_t, None):  # None -> internal XLA transpose
            got = sgm_extract_fused_hdw(
                vol, vt, p1=32, p2=384, num_paths=num_paths, image=l,
                adaptive_p2=True, p2_min=96, subpixel=True, uniqueness=0.95,
                lr_max_diff=1.5, interpret=True)
            gd = jnp.where(got.valid, got.disparity, INVALID_DISPARITY)
            np.testing.assert_array_equal(np.asarray(want.valid),
                                          np.asarray(got.valid))
            np.testing.assert_array_equal(np.asarray(want.disparity),
                                          np.asarray(gd))
            np.testing.assert_array_equal(np.asarray(want.cost),
                                          np.asarray(got.cost))

    @pytest.mark.parametrize("num_paths", [4, 8])
    def test_fused_rl_extract_bit_exact(self, num_paths):
        """sgm_extract_fused_wdh (horizontal sweeps last, extraction fused
        into the reverse sweep with a STREAMING right-view WTA, LR check on
        maps) is bit-identical to aggregate + extract_disparity_hdw."""
        from stereovisionarray_tpu.ops.cost_pallas import (
            fused_cost_volume_pallas_hdw,
            fused_cost_volume_pallas_wdh,
        )
        from stereovisionarray_tpu.ops.extract_pallas import extract_disparity_hdw
        from stereovisionarray_tpu.ops.sgm_pallas import (
            sgm_aggregate_pallas_hdw,
            sgm_extract_fused_wdh,
        )
        from stereovisionarray_tpu.ops.wta import INVALID_DISPARITY

        r = np.random.default_rng(9)
        b = r.uniform(0, 255, (44, 96)).astype(np.float32)
        l = jnp.asarray(b[:, :80])
        rt = jnp.asarray(b[:, 16:])
        D = 16
        vol = fused_cost_volume_pallas_hdw(l, rt, D, census_window=(5, 5),
                                           interpret=True)
        vol_t = fused_cost_volume_pallas_wdh(l, rt, D, census_window=(5, 5),
                                             block_rows=8, interpret=True)
        agg = sgm_aggregate_pallas_hdw(
            vol, p1=32, p2=384, num_paths=num_paths, image=l,
            adaptive_p2=True, p2_min=96, interpret=True)
        want = extract_disparity_hdw(
            agg, subpixel=True, uniqueness=0.95, lr_max_diff=1.5,
            interpret=True)
        for vt in (vol_t, None):
            got = sgm_extract_fused_wdh(
                vol, vt, p1=32, p2=384, num_paths=num_paths, image=l,
                adaptive_p2=True, p2_min=96, subpixel=True, uniqueness=0.95,
                lr_max_diff=1.5, interpret=True)
            gd = jnp.where(got.valid, got.disparity, INVALID_DISPARITY)
            np.testing.assert_array_equal(np.asarray(want.valid),
                                          np.asarray(got.valid))
            np.testing.assert_array_equal(np.asarray(want.disparity),
                                          np.asarray(gd))
            np.testing.assert_array_equal(np.asarray(want.cost),
                                          np.asarray(got.cost))

    def test_pallas_cost_builder_no_bt(self):
        from stereovisionarray_tpu.ops.cost_pallas import fused_cost_volume_pallas_hdw
        from stereovisionarray_tpu.ops.cost_volume import fused_cost_volume

        r = np.random.default_rng(1)
        b = r.uniform(0, 255, (24, 48)).astype(np.float32)
        l = jnp.asarray(b[:, :40])
        rt = jnp.asarray(b[:, 8:])
        want = np.asarray(fused_cost_volume(
            l, rt, 8, census_window=(5, 5), bt_weight=0.0, dtype=jnp.int16,
            layout="hdw"))
        got = np.asarray(fused_cost_volume_pallas_hdw(
            l, rt, 8, census_window=(5, 5), bt_weight=0.0, interpret=True))
        np.testing.assert_array_equal(got, want)

"""Two-view rectified SGM disparity pipeline — BASELINE.json configs 1 + 2,
the minimum end-to-end slice (SURVEY.md §7 step 5).

Replaces the reference's driver loop (``/root/reference/src/CameraStereoVision.cpp:49-100``):
per-pixel patch SAD over Bresenham candidates + WTA + uint8 disparity +
depth = camDist * f / (d * pixelSize). Here the whole pipeline is one jitted
function: census/BT cost volume -> 8-path SGM -> WTA + subpixel + uniqueness
+ LR check -> float disparity -> guarded depth conversion (the reference
divides by zero at ``:100``; we emit an explicit invalid sentinel).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from stereovisionarray_tpu.config import CostConfig, SGMConfig
from stereovisionarray_tpu.ops.cost_volume import fused_cost_volume, right_from_left_volume
from stereovisionarray_tpu.ops.sgm import sgm_aggregate
from stereovisionarray_tpu.ops.wta import INVALID_DISPARITY, disparity_from_volume


class TwoViewOutput(NamedTuple):
    disparity: jnp.ndarray  # (H, W) float32, INVALID_DISPARITY where rejected
    valid: jnp.ndarray  # (H, W) bool
    cost: jnp.ndarray  # (H, W) winning aggregated cost
    depth: Optional[jnp.ndarray] = None  # (H, W) when baseline+focal given
    confidence: Optional[jnp.ndarray] = None  # (H, W) PKRN in [0,1), 0 invalid


def disparity_to_depth(
    disparity: jnp.ndarray,
    baseline: float,
    focal_px: float,
    invalid_fill: float = 0.0,
) -> jnp.ndarray:
    """depth = B * f_px / d, guarded against d <= 0 (reference divides by
    zero, ``/root/reference/src/CameraStereoVision.cpp:98-100`` — its formula
    ``camDistance * f / (disp * pixelSize)`` is the same with f in meters,
    since f_px = f / pixel_size)."""
    safe = jnp.where(disparity > 1e-6, disparity, 1.0)
    depth = baseline * focal_px / safe
    return jnp.where(disparity > 1e-6, depth, invalid_fill)


def depth_to_disparity(
    depth: jnp.ndarray, baseline: float, focal_px: float, invalid_fill: float = 0.0
) -> jnp.ndarray:
    """Inverse of :func:`disparity_to_depth` (same guarded hyperbola)."""
    safe = jnp.where(depth > 1e-9, depth, 1.0)
    disp = baseline * focal_px / safe
    return jnp.where(depth > 1e-9, disp, invalid_fill)


from stereovisionarray_tpu.backend import resolve_backend as _resolve_backend


@functools.partial(
    jax.jit,
    static_argnames=("cost_cfg", "sgm_cfg", "baseline", "focal_px", "backend"),
)
def two_view_disparity(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cost_cfg: CostConfig = CostConfig(),
    sgm_cfg: SGMConfig = SGMConfig(),
    mask: Optional[jnp.ndarray] = None,
    baseline: Optional[float] = None,
    focal_px: Optional[float] = None,
    backend: str = "auto",
) -> TwoViewOutput:
    """Full rectified two-view pipeline on (H, W) grayscale images.

    All stages run on-device in one compiled program; configs are static
    (hashable frozen dataclasses) so each config compiles once.

    backend: "auto" | "xla" | "pallas" | "pallas_interpret". The Pallas
    path builds the cost volume in (H, D, W) layout (full 128-lane
    utilization for D < 128), runs the fused-sweep SGM kernels, and
    extracts disparity in one further volume pass — ~6x the XLA path's
    throughput on a TPU chip at 540x768x64, numerically identical modulo
    float summation order (same bad-2.0 on golden scenes)."""
    dtype = jnp.dtype(cost_cfg.dtype)
    if dtype == jnp.int8:
        from stereovisionarray_tpu.ops.cost_volume import int8_cost_fits

        if not int8_cost_fits(cost_cfg.census_window, cost_cfg.bt_weight,
                              cost_cfg.bt_clip):
            # large census windows overflow int8 at any useful scale —
            # silently widen (same pipeline, scale 4)
            dtype = jnp.dtype(jnp.int16)
    integer_costs = jnp.issubdtype(dtype, jnp.integer)
    compute_dtype = jnp.float32 if integer_costs else dtype
    left = left.astype(compute_dtype)
    right = right.astype(compute_dtype)
    resolved = _resolve_backend(backend)
    if integer_costs and resolved == "xla":
        # the XLA scan path stays float; integer costs are a Pallas-path
        # optimization (exact fixed-point math, half the HBM traffic)
        dtype = jnp.dtype(jnp.float32)
        integer_costs = False

    if resolved in ("pallas", "pallas_interpret"):
        from stereovisionarray_tpu.ops.cost_volume import cost_scale_for
        from stereovisionarray_tpu.ops.extract_pallas import extract_disparity_hdw
        from stereovisionarray_tpu.ops.sgm_pallas import sgm_aggregate_pallas_hdw

        interpret = resolved == "pallas_interpret"
        scale = cost_scale_for(dtype) if integer_costs else 1
        if integer_costs:
            # Fully-fused fast path: both cost layouts built directly
            # (zero pre-sweep volume transposes — the (W, D, H) builder is
            # roll-free), horizontal sweeps LAST, extraction fused into
            # the reverse horizontal sweep with a streaming right-view WTA
            # (the aggregated volume never touches HBM). Bit-identical to
            # the unfused aggregate + extract for integer costs
            # (tests/test_sgm_pallas.py::test_fused_rl_extract_bit_exact).
            from stereovisionarray_tpu.ops.cost_pallas import (
                fused_cost_volume_pallas_hdw,
                fused_cost_volume_pallas_wdh,
                wdh_block_rows,
            )
            from stereovisionarray_tpu.ops.sgm_pallas import (
                sgm_extract_fused_wdh,
            )
            from stereovisionarray_tpu.ops.wta import DisparityResult

            ckw = dict(
                census_window=cost_cfg.census_window,
                bt_weight=cost_cfg.bt_weight,
                bt_clip=cost_cfg.bt_clip,
                interpret=interpret,
                out_dtype=str(dtype),
            )
            br = wdh_block_rows(left.shape[1])
            if br is not None:
                # build ONCE in the roll-free (W, D, H) layout; the (H, D, W)
                # twin comes from one XLA transpose — measured ~0.17 ms/frame
                # cheaper than running the barrel-shift HDW builder as well
                # (scripts/perf_fused_ab.py: fused_rl vs fused_rl_2build)
                vol_t = fused_cost_volume_pallas_wdh(
                    left, right, cost_cfg.num_disparities, block_rows=br,
                    **ckw,
                )
                from stereovisionarray_tpu.ops.sgm_pallas import (
                    transpose_hdw as _transpose_hdw,
                )

                vol = _transpose_hdw(vol_t, interpret)
            else:  # odd width: barrel builder + internal transpose fallback
                vol = fused_cost_volume_pallas_hdw(
                    left, right, cost_cfg.num_disparities, **ckw
                )
                vol_t = None
            pen = lambda v: round(v * scale)
            maps = sgm_extract_fused_wdh(
                vol,
                vol_t,
                p1=pen(sgm_cfg.p1),
                p2=pen(sgm_cfg.p2),
                num_paths=sgm_cfg.num_paths,
                image=left,
                adaptive_p2=sgm_cfg.adaptive_p2,
                p2_min=pen(sgm_cfg.p2_min),
                subpixel=sgm_cfg.subpixel,
                uniqueness=sgm_cfg.uniqueness if sgm_cfg.uniqueness > 0 else 0.0,
                lr_max_diff=sgm_cfg.lr_max_diff if sgm_cfg.lr_max_diff > 0 else 0.0,
                interpret=interpret,
            )
            from stereovisionarray_tpu.ops.confidence import pkrn_confidence

            valid = maps.valid if mask is None else maps.valid & mask
            res = DisparityResult(
                disparity=jnp.where(valid, maps.disparity, INVALID_DISPARITY),
                cost=maps.cost,
                valid=valid,
                confidence=pkrn_confidence(maps.cost, maps.second, valid),
            )
        else:
            vol = fused_cost_volume(
                left,
                right,
                cost_cfg.num_disparities,
                census_window=cost_cfg.census_window,
                bt_weight=cost_cfg.bt_weight,
                bt_clip=cost_cfg.bt_clip,
                dtype=dtype,
                layout="hdw",
            )
            agg = sgm_aggregate_pallas_hdw(
                vol,
                p1=sgm_cfg.p1,
                p2=sgm_cfg.p2,
                num_paths=sgm_cfg.num_paths,
                image=left,
                adaptive_p2=sgm_cfg.adaptive_p2,
                p2_min=sgm_cfg.p2_min,
                interpret=interpret,
            )
            res = extract_disparity_hdw(
                agg,
                subpixel=sgm_cfg.subpixel,
                uniqueness=sgm_cfg.uniqueness if sgm_cfg.uniqueness > 0 else 0.0,
                lr_max_diff=sgm_cfg.lr_max_diff if sgm_cfg.lr_max_diff > 0 else 0.0,
                mask=mask,
                interpret=interpret,
            )
        # winning cost: expose the same (H, W) minimum the XLA path reports
        cost_map = res.cost
    else:
        vol = fused_cost_volume(
            left,
            right,
            cost_cfg.num_disparities,
            census_window=cost_cfg.census_window,
            bt_weight=cost_cfg.bt_weight,
            bt_clip=cost_cfg.bt_clip,
            dtype=dtype,
        )
        agg = sgm_aggregate(
            vol,
            p1=sgm_cfg.p1,
            p2=sgm_cfg.p2,
            num_paths=sgm_cfg.num_paths,
            image=left,
            adaptive_p2=sgm_cfg.adaptive_p2,
            p2_min=sgm_cfg.p2_min,
        )
        vol_right = right_from_left_volume(agg) if sgm_cfg.lr_max_diff > 0 else None
        res = disparity_from_volume(
            agg,
            vol_right=vol_right,
            subpixel=sgm_cfg.subpixel,
            uniqueness=sgm_cfg.uniqueness,
            lr_max_diff=sgm_cfg.lr_max_diff,
            mask=mask,
            with_confidence=True,
        )
        cost_map = res.cost

    disparity, valid = res.disparity, res.valid
    if sgm_cfg.median_filter or sgm_cfg.speckle_window > 0 or sgm_cfg.fill_holes:
        from stereovisionarray_tpu.ops.postfilter import (
            fill_holes,
            median3x3,
            speckle_filter,
        )

        if sgm_cfg.median_filter:
            disparity = median3x3(disparity, valid)
        if sgm_cfg.speckle_window > 0:
            disparity, valid = speckle_filter(
                disparity,
                valid,
                max_diff=sgm_cfg.speckle_max_diff,
                window=sgm_cfg.speckle_window,
                min_support=sgm_cfg.speckle_min_support,
            )
        if sgm_cfg.fill_holes:
            disparity, valid = fill_holes(disparity, valid)

    depth = None
    if baseline is not None and focal_px is not None:
        depth = jnp.where(
            valid,
            disparity_to_depth(disparity, baseline, focal_px),
            0.0,
        )
    conf = res.confidence
    if conf is not None:
        # post-filters can invalidate pixels after extraction
        conf = jnp.where(valid, conf, 0.0)
    return TwoViewOutput(
        disparity=disparity, valid=valid, cost=cost_map, depth=depth,
        confidence=conf,
    )

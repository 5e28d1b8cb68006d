"""Cascade (coarse-to-fine) two-view stereo for large disparity ranges.

The reference bounds its search by bracketing each ray between 0.5x and
1.0x depth and rasterizing that segment per pixel
(``/root/reference/src/CameraStereoVision.cpp:60-73``) — a per-pixel
data-dependent candidate list, which is exactly the control flow a TPU
cannot express efficiently. The TPU-native generalization is a static
two-level cascade:

1. **Coarse pass** — downsample both views by ``coarse_factor`` (area
   mean) and run the full fast pipeline with the disparity range scaled
   down accordingly (`D_total / factor` disparities at `1/factor**2` the
   pixels: ~`1/factor**3` of the flat cost volume).
2. **Band selection** — fill occlusion holes in the coarse map with the
   background surface (`ops/postfilter.fill_holes` — an empty band is
   unrecoverable, a background band is correct for occlusions by
   construction), upsample, and quantize to a per-pixel integer band
   offset `off(x) in {0, q, 2q, ...}` such that the true disparity lies
   in `[off, off + D_fine)` wherever the coarse estimate is within
   `+-(D_fine/2 - q/2)` px of the truth.
3. **Fine pass** — warp the right view by `off` (per-pixel integer shift
   realized as a one-hot select over the static set of shifted copies —
   NEVER a per-pixel gather, which serializes on TPU; see ops/wta.py) and
   run the same fast pipeline at `D_fine` disparities on (left, warped).
   Total disparity = `d_fine + off(x - round(d_fine))` — the band offset
   sampled where the fine match actually landed, again via one-hot
   selects over the static fine range.

Both passes reuse ``two_view_disparity`` unchanged, so the Pallas fused
kernels, confidence, and LR checking all apply at both levels. Measured
at (540, 768, 256) on a v5e chip (``scripts/perf_cascade.py``,
EVAL_CASCADE_r04): cascade 1.43 ms/frame vs flat 9.23 — **6.5x** — at
matching median error (0.135 vs 0.130 px); bad-2.0 1.25% vs 0.01%, the
loss concentrated at band boundaries and the range-border strip.

Known approximations (evaluated in ``tests/test_cascade.py`` and
``EVAL_CASCADE_r04.json``): census windows straddling a band-offset
discontinuity censure mixed-shift content (the offset field is
piecewise-constant at q-px granularity, so this is confined to band
boundaries); a coarse blunder larger than the band half-width is
unrecoverable in the fine pass (the speckle filter on the coarse map
suppresses isolated blunders before they become bands); and the usable
region starts ``~coarse_factor * 8`` px past the range border ``x = d(x)``
(the coarse pass is blind left of the local disparity, and its border
blunders + the upsample ramp widen the flat pipeline's border strip —
measured: bad columns end at x = 97 for d0 = 72, s = 4).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from stereovisionarray_tpu.config import CostConfig, SGMConfig
from stereovisionarray_tpu.models.two_view import (
    TwoViewOutput,
    disparity_to_depth,
    two_view_disparity,
)
from stereovisionarray_tpu.ops.postfilter import _shifted, fill_holes
from stereovisionarray_tpu.ops.wta import INVALID_DISPARITY

__all__ = ["cascade_two_view_disparity", "CascadeOutput"]


class CascadeOutput(NamedTuple):
    disparity: jnp.ndarray  # (H, W) float32 in the FULL range, sentinel invalid
    valid: jnp.ndarray  # (H, W) bool
    cost: jnp.ndarray  # (H, W) fine-pass winning cost
    depth: Optional[jnp.ndarray] = None
    confidence: Optional[jnp.ndarray] = None  # fine-pass PKRN
    coarse_disparity: Optional[jnp.ndarray] = None  # (H, W) upsampled px
    band_offset: Optional[jnp.ndarray] = None  # (H, W) int32 band start


# shared coarse-pass helpers (shape-generic over leading axes)
from stereovisionarray_tpu.models.cascade_sweep import (  # noqa: E402
    _area_downsample,
    _pad_to_multiple,
)


def _select_shifted(values: jnp.ndarray, index: jnp.ndarray, shifts) -> jnp.ndarray:
    """out(x) = values(x - shifts[i]) where index(x) == i.

    One-hot select-sum over a STATIC list of shifted copies — the TPU
    substitute for a per-pixel gather (pure VPU passes; see the gather
    gotcha in ops/wta.py::_value_at)."""
    out = jnp.zeros_like(values)
    for i, sh in enumerate(shifts):
        out = out + jnp.where(index == i, _shifted(values, 0, int(sh)), 0)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "cost_cfg",
        "sgm_cfg",
        "coarse_factor",
        "fine_disparities",
        "band_step",
        "baseline",
        "focal_px",
        "backend",
    ),
)
def cascade_two_view_disparity(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cost_cfg: CostConfig = CostConfig(num_disparities=256),
    sgm_cfg: SGMConfig = SGMConfig(),
    coarse_factor: int = 4,
    fine_disparities: int = 32,
    band_step: int = 8,
    baseline: Optional[float] = None,
    focal_px: Optional[float] = None,
    backend: str = "auto",
) -> CascadeOutput:
    """Large-range disparity via a coarse pass + banded fine pass.

    ``cost_cfg.num_disparities`` is the TOTAL range; the fine pass
    searches a per-pixel ``fine_disparities``-wide band positioned by the
    coarse result (band starts quantized to ``band_step``). Both passes
    run through :func:`two_view_disparity` with the given backend.
    """
    total = int(cost_cfg.num_disparities)
    s = int(coarse_factor)
    Df = int(fine_disparities)
    q = int(band_step)
    if total <= Df:
        raise ValueError("total range <= fine_disparities: use the flat pipeline")
    if Df % q or Df < 2 * q:
        raise ValueError("fine_disparities must be a multiple (>=2x) of band_step")

    H, W = left.shape

    # ---- coarse pass on the downsampled pair -------------------------------
    lp = _pad_to_multiple(left, s)
    rp = _pad_to_multiple(right, s)
    d_coarse = -(-total // s)  # ceil
    d_coarse = -(-d_coarse // 8) * 8  # sublane multiple for the Pallas path
    coarse_cost = dataclasses.replace(cost_cfg, num_disparities=d_coarse)
    # a coarse blunder poisons a whole fine band: median + speckle suppress
    # isolated blunders, fill_holes gives occlusions a background band
    coarse_sgm = dataclasses.replace(
        sgm_cfg,
        median_filter=True,
        speckle_window=max(sgm_cfg.speckle_window, 9),
        fill_holes=True,
    )
    coarse = two_view_disparity(
        _area_downsample(lp, s),
        _area_downsample(rp, s),
        coarse_cost,
        coarse_sgm,
        backend=backend,
    )
    cd = jnp.where(coarse.valid, coarse.disparity, 0.0) * float(s)
    up = jax.image.resize(cd, lp.shape, method="linear")[:H, :W]

    # ---- band offsets -------------------------------------------------------
    n_bands = (total - Df) // q + 1
    band = jnp.clip(
        jnp.round((up - 0.5 * Df) / q).astype(jnp.int32), 0, n_bands - 1
    )
    offset = band * q  # (H, W) int32, multiples of q

    # ---- fine pass on the band-warped right view ---------------------------
    shifts = [b * q for b in range(n_bands)]
    wright = _select_shifted(right, band, shifts)
    fine_cost = dataclasses.replace(cost_cfg, num_disparities=Df)
    fine = two_view_disparity(left, wright, fine_cost, sgm_cfg, backend=backend)

    # total disparity: the band offset sampled where the match landed
    df_round = jnp.clip(jnp.round(fine.disparity).astype(jnp.int32), 0, Df - 1)
    off_at = _select_shifted(
        offset.astype(jnp.float32), df_round, list(range(Df))
    )
    disparity = jnp.where(
        fine.valid, fine.disparity + off_at, INVALID_DISPARITY
    )
    valid = fine.valid

    depth = None
    if baseline is not None and focal_px is not None:
        depth = disparity_to_depth(
            jnp.where(valid, disparity, 0.0), baseline, focal_px
        )

    return CascadeOutput(
        disparity=disparity,
        valid=valid,
        cost=fine.cost,
        depth=depth,
        confidence=fine.confidence,
        coarse_disparity=up,
        band_offset=offset,
    )

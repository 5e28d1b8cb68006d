"""Fused disparity extraction from an (H, D, W) aggregated volume — one
Pallas pass replacing four volume-sized XLA stages.

The XLA extraction path costs ~14 ms at 540x768x64 (right_from_left gather
~5 ms + WTA/subpixel/uniqueness/LR ~8 ms, each re-reading the volume from
HBM). This kernel reads the aggregated volume ONCE and emits four small
(H, W) maps:

  - left subpixel disparity + winning cost,
  - second-best cost outside the winner's ±1 (uniqueness test numerator),
  - right-view subpixel disparity, computed from the SAME rows via the
    in-VMEM barrel shift cost_R[d, x] = cost_L[d, x + d] (6 lane-shift +
    select steps for D=64 — the reindexing that costs a full gather pass
    in XLA is free once the row is on-chip).

The cheap (H, W)-sized finishing steps — uniqueness compare, LR gather at
``x - d_L`` (a fast 2D gather), masking — stay in XLA
(:func:`extract_disparity_hdw`).

Layout notes (pallas_guide.md): W rides the 128-lane axis (full lanes for
any W % 128 == 0), D rides sublanes; min/argmin over D are cross-sublane
reduces; d±1 neighbours are sublane shifts. Row blocks of 8 keep the 2D
output BlockSpecs tile-legal ((8, W) blocks); the ragged last block is
handled by Pallas boundary padding (extraction is row-independent, and
writes outside (H, W) are dropped).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereovisionarray_tpu.ops.wta import INVALID_DISPARITY

_BIG = 1e9


def _wta_row(a, d_iota, D):
    """(D, W) row -> (1, W) each of: min cost, int winner, c_minus, c_plus,
    second-best outside winner±1."""
    cmin = jnp.min(a, axis=0, keepdims=True)  # (1, W)
    d_int = jnp.min(jnp.where(a == cmin, d_iota, D), axis=0, keepdims=True)
    # neighbours of the winner for the parabola (clamped interior)
    d_c = jnp.clip(d_int, 1, D - 2)
    cm = jnp.sum(jnp.where(d_iota == d_c - 1, a, 0.0), axis=0, keepdims=True)
    c0 = jnp.sum(jnp.where(d_iota == d_c, a, 0.0), axis=0, keepdims=True)
    cp = jnp.sum(jnp.where(d_iota == d_c + 1, a, 0.0), axis=0, keepdims=True)
    second = jnp.min(
        jnp.where(jnp.abs(d_iota - d_int) <= 1, _BIG, a), axis=0, keepdims=True
    )
    return cmin, d_int, d_c, cm, c0, cp, second


def _subpixel(d_int, d_c, cm, c0, cp, D, dtype):
    denom = cm - 2.0 * c0 + cp
    safe = jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0)
    delta = jnp.where(jnp.abs(denom) > 1e-9, (cm - cp) / (2.0 * safe), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    interior = (d_int >= 1) & (d_int <= D - 2)
    return jnp.where(interior, d_c.astype(dtype) + delta, d_int.astype(dtype))


def _extract_kernel(vol_ref, disp_ref, cost_ref, second_ref, dispr_ref, *,
                    rows, n_disp):
    D = n_disp
    for r in range(rows):
        a = vol_ref[r]  # (D, W)
        d_iota = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
        cmin, d_int, d_c, cm, c0, cp, second = _wta_row(a, d_iota, D)
        disp_ref[r] = _subpixel(d_int, d_c, cm, c0, cp, D, a.dtype)[0]
        cost_ref[r] = cmin[0]
        second_ref[r] = second[0]

        # right view: a_r[d, x] = a[d, x + d] via 6 barrel steps
        ar = a
        shift = 1
        while shift < D:
            pad = jnp.full_like(ar[:, :shift], _BIG)
            shifted = jnp.concatenate([ar[:, shift:], pad], axis=1)
            take = (d_iota // shift) % 2 == 1
            ar = jnp.where(take, shifted, ar)
            shift *= 2
        _, dr_int, dr_c, rm, r0, rp, _ = _wta_row(ar, d_iota, D)
        dispr_ref[r] = _subpixel(dr_int, dr_c, rm, r0, rp, D, a.dtype)[0]


class ExtractMaps(NamedTuple):
    disparity: jnp.ndarray  # (H, W) left subpixel disparity
    cost: jnp.ndarray  # (H, W) winning aggregated cost
    second: jnp.ndarray  # (H, W) second-best cost outside winner±1
    disparity_right: jnp.ndarray  # (H, W) right-view subpixel disparity


def extract_maps_hdw(vol: jnp.ndarray, interpret: bool = False) -> ExtractMaps:
    """One fused pass over an (H, D, W) aggregated volume."""
    h, d, w = vol.shape
    rows = 8
    nblocks = pl.cdiv(h, rows)
    idx3 = lambda i: (i, 0, 0)
    idx2 = lambda i: (i, 0)
    out2 = lambda: pl.BlockSpec((rows, w), idx2, memory_space=pltpu.VMEM)
    shape2 = jax.ShapeDtypeStruct((h, w), vol.dtype)
    disp, cost, second, dispr = pl.pallas_call(
        functools.partial(_extract_kernel, rows=rows, n_disp=d),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((rows, d, w), idx3, memory_space=pltpu.VMEM)],
        out_specs=(out2(), out2(), out2(), out2()),
        out_shape=(shape2, shape2, shape2, shape2),
        interpret=interpret,
    )(vol)
    return ExtractMaps(disp, cost, second, dispr)


@functools.partial(
    jax.jit,
    static_argnames=("subpixel", "uniqueness", "lr_max_diff", "interpret"),
)
def extract_disparity_hdw(
    vol: jnp.ndarray,
    subpixel: bool = True,
    uniqueness: float = 0.0,
    lr_max_diff: float = 0.0,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
):
    """Drop-in (H, D, W) replacement for ``wta.disparity_from_volume`` +
    ``cost_volume.right_from_left_volume``: same outputs
    (DisparityResult-shaped tuple) from one volume pass.

    Note: `subpixel` is accepted for API parity; the fused kernel always
    computes the parabola (integer extraction costs the same pass)."""
    from stereovisionarray_tpu.ops.wta import DisparityResult, left_right_check

    maps = extract_maps_hdw(vol, interpret=interpret)
    disp = maps.disparity if subpixel else jnp.round(maps.disparity)
    valid = jnp.ones(disp.shape, dtype=bool)
    if uniqueness > 0.0:
        valid &= maps.cost < uniqueness * maps.second
    if lr_max_diff > 0.0:
        dr = maps.disparity_right if subpixel else jnp.round(maps.disparity_right)
        valid &= left_right_check(disp, dr, lr_max_diff)
    if mask is not None:
        valid &= mask
    disp = jnp.where(valid, disp, INVALID_DISPARITY)
    return DisparityResult(disparity=disp, cost=maps.cost, valid=valid)

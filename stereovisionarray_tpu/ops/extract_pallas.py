"""Fused disparity extraction from an (H, D, W) aggregated volume — one
Pallas pass replacing four volume-sized XLA stages.

The XLA extraction path costs ~14 ms at 540x768x64 (right_from_left gather
~5 ms + WTA/subpixel/uniqueness/LR ~8 ms, each re-reading the volume from
HBM; even the final (H, W) ``take_along_axis`` LR gather lowers to a ~5 ms
serialized gather). This kernel reads the aggregated volume ONCE and
computes everything on-chip:

  - left WTA + subpixel parabola + winning cost;
  - uniqueness ratio test (second-best outside the winner's ±1);
  - right-view WTA + subpixel from the SAME rows via the in-VMEM barrel
    shift cost_R[d, x] = cost_L[d, x + d] (log2(D) lane-shift + select
    steps — each step shifts every sublane row d by a bit of its OWN d,
    which composes exactly because the shift is uniform along lanes);
  - the left-right consistency gather d_R(x - d_L(x)) by the reverse
    barrel trick: build R2[d, x] = d_R(x - d) for all d (again uniform
    per-sublane shifts), then reduce with a one-hot over d = round(d_L).

Layout notes (pallas_guide.md): W rides the 128-lane axis, D rides
sublanes; min/argmin over D are cross-sublane reduces; d±1 neighbours are
sublane shifts. Row blocks of 8 keep the 2D output BlockSpecs tile-legal
((8, W) blocks); the ragged last block is handled by Pallas boundary
padding (extraction is row-independent; writes outside (H, W) are
dropped).

Border semantics: out-of-image right-view candidates (x + d >= W) and LR
sources (x - d < 0) are BIG instead of the XLA path's edge clamping —
border validity may differ in the rightmost/leftmost D columns (the Pallas
choice is the conservative one).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereovisionarray_tpu.ops.wta import INVALID_DISPARITY, DisparityResult

_BIG = 1e9
_BIG_INT = 16000


def _big_for(dtype):
    return _BIG_INT if jnp.issubdtype(dtype, jnp.integer) else _BIG


def _wta_row(a, d_iota, D):
    """(D, W) row -> (1, W) each of: min cost, int winner, clamped winner,
    c_minus/c0/c_plus parabola samples, second-best outside winner±1.

    Integer volumes take the PACKED path: one min over ``cost << lg | d``
    yields min cost AND its smallest-d argmin in a single reduce (SGM
    aggregates are non-negative and << 2^25, so the pack is exact in i32),
    replacing the min + masked-argmin-min pair; the three parabola samples
    share ONE one-hot (``d == d_c``) applied to sublane-shifted copies of
    ``a`` instead of three separate iota compares."""
    zero = jnp.zeros((), a.dtype)
    if jnp.issubdtype(a.dtype, jnp.integer):
        lg = (D - 1).bit_length()
        packed = (a << lg) | d_iota
        pmin = jnp.min(packed, axis=0, keepdims=True)
        cmin = pmin >> lg
        d_int = pmin & ((1 << lg) - 1)
    else:
        cmin = jnp.min(a, axis=0, keepdims=True)  # (1, W)
        d_int = jnp.min(jnp.where(a == cmin, d_iota, D), axis=0, keepdims=True)
    d_c = jnp.clip(d_int, 1, D - 2)
    sel = d_iota == d_c
    a_dn = jnp.concatenate([a[:1], a[:-1]], axis=0)  # row 0 dead: d_c >= 1
    a_up = jnp.concatenate([a[1:], a[-1:]], axis=0)  # row D-1 dead: d_c <= D-2
    cm = jnp.sum(jnp.where(sel, a_dn, zero), axis=0, keepdims=True)
    # center sample: a[d_c] == a[d_int] == cmin wherever the winner is
    # interior (d_c == d_int); border lanes discard delta via the
    # `interior` mask in _subpixel — so reuse cmin, one reduce fewer
    c0 = cmin
    cp = jnp.sum(jnp.where(sel, a_up, zero), axis=0, keepdims=True)
    second = jnp.min(
        jnp.where(jnp.abs(d_iota - d_int) <= 1,
                  jnp.asarray(_big_for(a.dtype), a.dtype), a),
        axis=0, keepdims=True,
    )
    return cmin, d_int, d_c, cm, c0, cp, second


def _subpixel(d_int, d_c, cm, c0, cp, D, dtype):
    # parabola in f32 regardless of the volume dtype (int16 volumes carry
    # exact sums; the fit itself needs fractional math)
    cm = cm.astype(jnp.float32)
    c0 = c0.astype(jnp.float32)
    cp = cp.astype(jnp.float32)
    denom = cm - 2.0 * c0 + cp
    safe = jnp.where(jnp.abs(denom) > 1e-9, denom, 1.0)
    delta = jnp.where(jnp.abs(denom) > 1e-9, (cm - cp) / (2.0 * safe), 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    interior = (d_int >= 1) & (d_int <= D - 2)
    # always f32 out: the volume dtype may be int16 (exact-cost mode)
    return jnp.where(
        interior, d_c.astype(jnp.float32) + delta, d_int.astype(jnp.float32)
    )


def _barrel(mat, d_iota, D, left: bool, fill):
    """Shift every sublane row d of (D, W) `mat` by d lanes; left=True
    means row d reads from x+d (out[d,x] = mat[d, x+d]), else from x-d."""
    fill = jnp.asarray(fill, mat.dtype)
    shift = 1
    while shift < D:
        if left:
            pad = jnp.full_like(mat[:, :shift], fill)
            shifted = jnp.concatenate([mat[:, shift:], pad], axis=1)
        else:
            pad = jnp.full_like(mat[:, :shift], fill)
            shifted = jnp.concatenate([pad, mat[:, :-shift]], axis=1)
        take = (d_iota // shift) % 2 == 1
        mat = jnp.where(take, shifted, mat)
        shift *= 2
    return mat


def _barrel_broadcast(row, D, w, left: bool, fill):
    """Shifted-row slab from ONE (1, W) row: out[d, x] = row[x+d] (left)
    or row[x-d], `fill` outside. An 8-row base barrel + log-doubling
    (rows n..2n-1 are rows 0..n-1 shifted n further — fill-shifts compose
    just like the circular rolls in cost_pallas._shifted_rows), ~5x fewer
    slot-ops than barreling the full broadcast (D, W) slab."""
    fill = jnp.asarray(fill, row.dtype)
    base = jnp.broadcast_to(row, (min(8, D), w))
    d8 = jax.lax.broadcasted_iota(jnp.int32, base.shape, 0)

    def sh(m, s):
        pad = jnp.full((m.shape[0], s), fill, m.dtype)
        if left:
            return jnp.concatenate([m[:, s:], pad], axis=1)
        return jnp.concatenate([pad, m[:, :-s]], axis=1)

    shift = 1
    while shift < base.shape[0]:
        base = jnp.where((d8 // shift) % 2 == 1, sh(base, shift), base)
        shift *= 2
    out, n = base, base.shape[0]
    while n < D:
        out = jnp.concatenate([out, sh(out, n)], axis=0)
        n *= 2
    return out[:D] if out.shape[0] != D else out


def _right_at_left(d_sub, dr_sub, D):
    """at[x] = d_R(x - round(d_L(x))), _BIG where x - d_L is out of image.

    d_sub/dr_sub: (1, W) f32 left/right subpixel disparity rows. The LR
    gather shared by the in-volume extraction (``extract_row_maps``) and
    the map-level kernel (``lr_gather_maps``): R2[d, x] = d_R(x - d) via
    the reverse broadcast barrel, then the one-hot row-select at
    d = round(d_L(x))."""
    w = d_sub.shape[1]
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, w), 0)
    r2 = _barrel_broadcast(dr_sub, D, w, left=False, fill=_BIG)
    dl_int = jnp.clip(jnp.round(d_sub).astype(jnp.int32), 0, D - 1)  # (1, W)
    return jnp.sum(jnp.where(d_iota == dl_int, r2, 0.0), axis=0,
                   keepdims=True)


def extract_row_maps(a16, D, subpixel, uniqueness, lr_max_diff):
    """Extraction math for ONE (D, W) aggregated slab in the volume dtype.

    Returns ``(d_sub, cost, ok, second)``, each ``(1, W)`` (f32, f32, bool,
    f32; ``second`` = best cost outside winner±1, the PKRN confidence
    numerator — computed for the uniqueness test anyway, exported for
    ``ops/confidence.py``). Shared by the standalone extraction kernel below
    and the fused final-sweep-plus-extraction kernel in
    ``ops/sgm_pallas.py`` (which has the slab in registers and skips the
    extra volume write + read)."""
    if a16.dtype == jnp.int8:
        # int8 volumes (raw-WTA mode over an int8 cost volume): the barrel
        # below runs on the narrow dtype, and Mosaic legalizes no i8
        # arithmetic beyond load/store — widen to int16 first (same barrel
        # cost class, still half of i32)
        a16 = a16.astype(jnp.int16)
    compute_dtype = jnp.int32 if a16.dtype == jnp.int16 else a16.dtype
    a = a16.astype(compute_dtype)  # reductions need >= i32 (Mosaic)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    cmin, d_int, d_c, cm, c0, cp, second = _wta_row(a, d_iota, D)
    d_sub = (
        _subpixel(d_int, d_c, cm, c0, cp, D, a.dtype)
        if subpixel
        else d_int.astype(jnp.float32)
    )
    cost = cmin.astype(jnp.float32)

    ok = jnp.ones(cmin.shape, dtype=jnp.bool_)
    if uniqueness > 0.0:
        ok &= cost < uniqueness * second.astype(jnp.float32)
    if lr_max_diff > 0.0:
        # right-view volume rows: a_r[d, x] = a[d, x + d]. The barrel is
        # pure shifts+selects (no reductions), so it runs on the NARROW
        # volume dtype — half the VPU slots for int16 volumes — and
        # upcasts only for the reduce-based WTA that follows.
        ar = _barrel(a16, d_iota, D, left=True,
                     fill=_big_for(a16.dtype)).astype(compute_dtype)
        _, dr_int, dr_c, rm, r0, rp, _ = _wta_row(ar, d_iota, D)
        dr_sub = (
            _subpixel(dr_int, dr_c, rm, r0, rp, D, a.dtype)
            if subpixel
            else dr_int.astype(jnp.float32)
        )
        at = _right_at_left(d_sub, dr_sub, D)
        ok &= jnp.abs(d_sub - at) <= lr_max_diff
        ok &= at < _BIG  # x - d_L out of image -> no evidence
    return d_sub, cost, ok, second.astype(jnp.float32)


def _extract_kernel(vol_ref, disp_ref, cost_ref, valid_ref, second_ref, *,
                    rows, n_disp, subpixel, uniqueness, lr_max_diff):
    for r in range(rows):
        a16 = vol_ref[r]  # (D, W) in the VOLUME dtype (int16 on the fast path)
        d_sub, cost, ok, second = extract_row_maps(
            a16, n_disp, subpixel, uniqueness, lr_max_diff
        )
        disp_ref[r] = d_sub[0]
        cost_ref[r] = cost[0]
        valid_ref[r] = ok[0]
        second_ref[r] = second[0]


def _lr_check_kernel(dl_ref, dr_ref, ok_ref, *, rows, n_disp):
    """Left-right consistency on (H, W) MAPS: ok[y, x] =
    |d_L(y, x) - d_R(y, x - round(d_L))| <= lr_max_diff is evaluated by the
    caller; this kernel only produces at[y, x] = d_R(y, x - dl_int) with
    BIG where x - dl_int is out of image — the same reverse broadcast
    barrel + one-hot reduce as the in-volume extraction kernel, but over
    1000x less data (maps, not volumes)."""
    for r in range(rows):
        dl = dl_ref[r][None, :]  # (1, W) f32
        dr = dr_ref[r][None, :]
        ok_ref[r] = _right_at_left(dl, dr, n_disp)[0]


def lr_gather_maps(disp_l, disp_r, n_disp, interpret: bool = False):
    """at(y, x) = disp_r(y, x - round(disp_l(y, x))), BIG out of image.

    disp_l/disp_r: (H, W) f32 maps (left/right subpixel disparity)."""
    h, w = disp_l.shape
    rows = 8
    nblocks = pl.cdiv(h, rows)
    idx2 = lambda i: (i, 0)
    spec = pl.BlockSpec((rows, w), idx2, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_lr_check_kernel, rows=rows, n_disp=int(n_disp)),
        grid=(nblocks,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        # scoped-vmem cap: blocks scale with D; the default 16 MB limit
        # OOMs at D=256 (cascade flat-oracle); v5e has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(disp_l.astype(jnp.float32), disp_r.astype(jnp.float32))


class ExtractMaps(NamedTuple):
    disparity: jnp.ndarray  # (H, W) subpixel disparity (pre-masking)
    cost: jnp.ndarray  # (H, W) winning aggregated cost
    valid: jnp.ndarray  # (H, W) uniqueness & LR validity
    second: jnp.ndarray  # (H, W) second-best cost outside winner±1 (PKRN)


def extract_maps_hdw(
    vol: jnp.ndarray,
    subpixel: bool = True,
    uniqueness: float = 0.0,
    lr_max_diff: float = 0.0,
    interpret: bool = False,
) -> ExtractMaps:
    """One fused pass over an (H, D, W) aggregated volume."""
    h, d, w = vol.shape
    rows = 8
    nblocks = pl.cdiv(h, rows)
    idx3 = lambda i: (i, 0, 0)
    idx2 = lambda i: (i, 0)
    out2 = lambda: pl.BlockSpec((rows, w), idx2, memory_space=pltpu.VMEM)
    disp, cost, valid, second = pl.pallas_call(
        functools.partial(
            _extract_kernel,
            rows=rows,
            n_disp=d,
            subpixel=bool(subpixel),
            uniqueness=float(uniqueness),
            lr_max_diff=float(lr_max_diff),
        ),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((rows, d, w), idx3, memory_space=pltpu.VMEM)],
        out_specs=(out2(), out2(), out2(), out2()),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.bool_),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ),
        # scoped-vmem cap: blocks scale with D; the default 16 MB limit
        # OOMs at D=256 (cascade flat-oracle); v5e has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(vol)
    return ExtractMaps(disp, cost, valid, second)


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
) -> DisparityResult:
    """Drop-in (H, D, W) replacement for ``wta.disparity_from_volume`` +
    ``cost_volume.right_from_left_volume``: same outputs from ONE volume
    pass (WTA, subpixel, uniqueness, and the LR check all in-kernel)."""
    maps = extract_maps_hdw(
        vol,
        subpixel=subpixel,
        uniqueness=uniqueness,
        lr_max_diff=lr_max_diff,
        interpret=interpret,
    )
    valid = maps.valid
    if mask is not None:
        valid = valid & mask
    disp = jnp.where(valid, maps.disparity, INVALID_DISPARITY)
    from stereovisionarray_tpu.ops.confidence import pkrn_confidence

    conf = pkrn_confidence(maps.cost, maps.second, valid)
    return DisparityResult(
        disparity=disp, cost=maps.cost, valid=valid, confidence=conf
    )

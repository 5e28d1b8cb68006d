"""Pallas fused cost-volume builder, (H, D, W) int16 output.

The XLA builder (``cost_volume.fused_cost_volume``) evaluates 64 shifted
census-hamming + Birchfield-Tomasi slices as separate gather+popcount
passes (~4 ms of the ~11 ms frame at 540x768x64). This kernel builds the
whole (D, W) cost slab per image row on-chip:

 - the D shifted right-census rows come from ONE broadcast + log2(D)
   barrel steps (uniform shift per sublane row — each row d ends up
   holding census_R[x - d]), instead of D separate gathers;
 - hamming = popcount(xor) on the fat (D, W) slab (both 32-bit planes);
 - the BT term uses the same barrel on the right image / half-pixel
   bounds rows;
 - out-of-image candidates (x < d) get the worst cost, matching the XLA
   builder (``cost_volume.py``: census -> n_bits, BT -> clip).

Output is int16 fixed-point (scale ``COST_SCALE`` = 4), the native dtype
of the fast SGM path. Numerics match the XLA int16 builder exactly
except where the barrel's zero-fill differs from the XLA edge-clamp
UNDER the x < d mask — i.e. nowhere observable (both are overwritten by
the mask value).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stereovisionarray_tpu.ops.census import census_transform
from stereovisionarray_tpu.ops.cost_volume import (
    COST_SCALE,
    cost_scale_for,
    int8_cost_fits,
)

__all__ = [
    "fused_cost_volume_pallas_hdw",
    "fused_cost_volume_pallas_wdh",
    "wdh_block_rows",
]


def wdh_block_rows(w: int):
    """Default block_rows for :func:`fused_cost_volume_pallas_wdh`, or None
    when no legal tiling exists (W not a multiple of 8 — the sublane
    constraint of the (R, H) input blocks). 48 measured fastest at
    540x768x64 (0.248 ms vs 0.265 at 32, scripts/perf_fused_ab.py); the
    chain keeps the tile <= 48 so n_views (shifted window copies) stays
    small. Lives next to the kernel so callers don't re-derive the
    legality rule."""
    return next((r for r in (48, 32, 16, 8) if w % r == 0), None)


def _shifted_rows(row, n_rows, w):
    """(n_rows, W) from a (1, W) row: out[d, x] = row[(x - d) mod W].

    Builds an 8-row base barrel (3 roll+select steps on (8, W)) and then
    DOUBLES it log-style — rows n..2n-1 are one circular roll of rows
    0..n-1 by n (roll composition: roll(roll(r, d), n) = roll(r, d + n)) —
    instead of rolling the full (D, W) slab log2(D) times. ~5x fewer VPU
    slot-ops than the full-slab barrel (measured: cost_build 1.47 ->
    see CLAUDE.md). Circular (not zero-fill) so the wrapped lanes
    reproduce the XLA builder's ``jnp.roll`` half-pixel-bound semantics
    exactly; the x < d region is masked to the worst cost downstream.
    ``pltpu.roll`` is a native lane rotate (a tail-slice concat at lane
    W-1 is an invalid Mosaic relayout)."""
    base = jnp.broadcast_to(row, (min(8, n_rows) if n_rows < 8 else 8, w))
    d8 = jax.lax.broadcasted_iota(jnp.int32, base.shape, 0)
    shift = 1
    while shift < base.shape[0]:
        shifted = pltpu.roll(base, shift, axis=1)
        base = jnp.where((d8 // shift) % 2 == 1, shifted, base)
        shift *= 2
    s, n = base, base.shape[0]
    while n < n_rows:
        s = jnp.concatenate([s, pltpu.roll(s, n, axis=1)], axis=0)
        n *= 2
    return s[:n_rows] if s.shape[0] != n_rows else s


def _cost_kernel(*refs, rows, n_disp, n_planes, n_bits, bt_weight, bt_clip,
                 scale):
    # refs: [cl_0..cl_{P-1}, cr_0..cr_{P-1}, lt, lmn, lmx, rt, out]
    # Census planes arrive as SEPARATE (rows, W) u32 blocks — a packed
    # (rows, W, P) block would put the size-P axis on the 128-lane dim and
    # blow VMEM up 128/P-fold (measured: scoped-vmem OOM at P=2).
    cl_refs = refs[:n_planes]
    cr_refs = refs[n_planes : 2 * n_planes]
    lt_ref, lmn_ref, lmx_ref, rt_ref, out_ref = refs[2 * n_planes :]
    D = n_disp
    w = out_ref.shape[-1]
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, w), 0)
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (D, w), 1)
    oob = x_iota < d_iota
    worst = float(n_bits) + (bt_weight * bt_clip if bt_weight > 0.0 else 0.0)

    # fori_loop over the block's rows (NOT a Python unroll: the census
    # barrels make each row's trace large, and an 8x unroll pushed Mosaic
    # compile time past 15 minutes)
    def body(r, _):
        ham = None
        for p in range(n_planes):
            cl = cl_refs[p][r][None, :]  # (1, W) uint32
            cr = cr_refs[p][r][None, :]
            cr_sh = _shifted_rows(cr, D, w)
            pc = jax.lax.population_count(cl ^ cr_sh).astype(jnp.int32)
            ham = pc if ham is None else ham + pc

        cost_f = ham.astype(jnp.float32)
        if bt_weight > 0.0:
            lt = lt_ref[r][None, :]  # (1, W) f32
            l_mn = lmn_ref[r][None, :]
            l_mx = lmx_ref[r][None, :]
            rt = rt_ref[r][None, :]

            # ONE barrel (D+1 rows) of the right image; the shifted
            # half-pixel bounds are DERIVED from it by sublane shifts:
            #   up[d, x] = r[(x-d-1) mod W] = rs_ext[d+1, x]
            #   dn[d, x] = r[(x-d+1) mod W] = rs_ext[d-1, x] (row -1 = the
            #       circular left-roll of the raw row)
            #   rmn[x'] = min(r, lh, rh)[x'] = (r[x'] + min3(r, up, dn)) / 2
            # which matches the XLA builder's jnp.roll bounds bit-for-bit
            # (both are circular) — replaces two more full barrels.
            # The extra row (shift D) for up[D-1] = rs[D] comes from ONE
            # single-row roll instead of asking _shifted_rows for D+1 rows
            # — with D a power of two that would force a final doubling to
            # 2D (e.g. 120 instead of 56 rolled rows at D=64), and rolls
            # are the expensive ops in this kernel (lane shuffles; the
            # precomputed-bounds variant with 3 independent D-row barrels
            # and NO derivation math measured 2.55 -> 2.83 ms e2e).
            rs = _shifted_rows(rt, D, w)
            row_d = pltpu.roll(rt, D % w, axis=1)  # (1, W): shift by D
            up = jnp.concatenate([rs[1:], row_d], axis=0)
            dn_row0 = pltpu.roll(rt, w - 1, axis=1)  # left-roll by 1
            dn = jnp.concatenate([dn_row0, rs[: D - 1]], axis=0)
            m3mn = jnp.minimum(jnp.minimum(up, dn), rs)
            m3mx = jnp.maximum(jnp.maximum(up, dn), rs)
            rmn = 0.5 * (rs + m3mn)
            rmx = 0.5 * (rs + m3mx)
            d_lr = jnp.maximum(0.0, jnp.maximum(lt - rmx, rmn - lt))
            d_rl = jnp.maximum(0.0, jnp.maximum(rs - l_mx, l_mn - rs))
            bt = jnp.minimum(jnp.minimum(d_lr, d_rl), bt_clip)
            cost_f = cost_f + bt_weight * bt

        cost_f = jnp.where(oob, worst, cost_f)
        out_ref[r] = _store_scaled(cost_f, scale, out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, rows, body, 0)


def _store_scaled(cost_f, scale, dtype):
    """round(cost * scale) as `dtype`. int8 routes through i32 — Mosaic
    legalizes i32->i8 stores but direct f32->i8 casts are untested on this
    toolchain (scripts/probe_i8_ops.py probed the i32 route)."""
    q = jnp.round(cost_f * scale)
    if jnp.dtype(dtype) == jnp.int8:
        return q.astype(jnp.int32).astype(jnp.int8)
    return q.astype(dtype)


# --------------------------------------------------------------------- #
# (W, D, H) builder — the transposed-volume twin, and the ROLL-FREE one.
#
# In (W, D, H) layout the disparity-shift axis (W) rides the GRID/sublane
# dims, not lanes: the D shifted right-census rows for output row x are a
# CONTIGUOUS ascending sublane window of a REVERSED transposed right
# image (rev[k] = right_T[W-1-k]  =>  right_T[x-d] = rev[(W-1-x)+d]), so
# the whole barrel apparatus of the (H, D, W) builder disappears — slab
# construction is pure static slicing. Feeds the horizontal SGM sweeps
# directly, replacing the XLA (H,D,W)->(W,D,H) volume transpose (~0.32 ms
# at 540x768x64, 2.5x its HBM bound).
#
# Mosaic constraint (scripts/probe_dynamic_slab2.py): a DYNAMIC sublane
# slice start derived from program_id crashes the v5e compiler; static
# starts are fine. The window [W-x-1, W-x+D] moves exactly R rows per
# grid step, so the reversed arrays are passed V = 1 + ceil((D+1)/R)
# times with block index maps (nb-1-i), (nb-i), ... — concatenating the
# views gives a (V*R, H) slab in which every per-row offset is STATIC
# (row r reads [R-r-1, R-r+D]).
# --------------------------------------------------------------------- #


def _wdh_kernel(*refs, rows, n_disp, n_planes, n_views, n_bits, bt_weight,
                bt_clip, scale):
    # refs: [cl_p blocks (P), lt, lmn, lmx (blocked (rows, H)),
    #        crev_p views (P * V), rrev views (V),
    #        rmnrev views (V), rmxrev views (V) (bt only), out]
    D = n_disp
    P, V = n_planes, n_views
    cl_refs = refs[:P]
    lt_ref, lmn_ref, lmx_ref = refs[P : P + 3]
    crev_refs = [refs[P + 3 + p * V : P + 3 + (p + 1) * V] for p in range(P)]
    rrev_refs = refs[P + 3 + P * V : P + 3 + (P + 1) * V]
    if bt_weight > 0.0:
        rmn_refs = refs[P + 3 + (P + 1) * V : P + 3 + (P + 2) * V]
        rmx_refs = refs[P + 3 + (P + 2) * V : P + 3 + (P + 3) * V]
    out_ref = refs[-1]
    h = out_ref.shape[-1]
    i = pl.program_id(0)

    # one (V*R, H) window per reversed array, shared by all rows in block
    crev = [jnp.concatenate([v[:] for v in crev_refs[p]], axis=0)
            for p in range(P)]
    rrev = jnp.concatenate([v[:] for v in rrev_refs], axis=0)
    if bt_weight > 0.0:
        # the right view's half-pixel BT bounds, precomputed in XLA and
        # streamed like rrev: in this ROLL-FREE builder the per-d values
        # are plain static slices, so precomputing trades ~6 in-kernel
        # f32 ops per (d, pixel) (min3/max3 + 2 muls) for two cheap
        # operand streams. (The BARREL builder keeps its in-kernel
        # derivation: there the extra operands cost 1.7x the roll-rows
        # and measured SLOWER — CLAUDE.md round-2 notes.)
        rmnrev = jnp.concatenate([v[:] for v in rmn_refs], axis=0)
        rmxrev = jnp.concatenate([v[:] for v in rmx_refs], axis=0)

    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, h), 0)
    worst = float(n_bits) + (bt_weight * bt_clip if bt_weight > 0.0 else 0.0)

    # Python-unrolled rows: every slice start below must be STATIC — a
    # traced start (fori_loop index) crashes the v5e Mosaic compiler
    # (scripts/probe_dynamic_slab2.py). The per-row trace is ~35 plain
    # slab ops (no barrels), so the unroll stays compile-friendly.
    for r in range(rows):
        # out[x, d, y] with x = i*rows + r; window-local position of ext
        # row (W - x) is rows - r — static. Only the OOB mask sees i.
        x = i * rows + r
        ham = None
        for p in range(P):
            cl = cl_refs[p][r][None, :]  # (1, H) uint32
            cr_sh = crev[p][rows - r : rows - r + D]
            pc = jax.lax.population_count(cl ^ cr_sh).astype(jnp.int32)
            ham = pc if ham is None else ham + pc

        cost_f = ham.astype(jnp.float32)
        if bt_weight > 0.0:
            lt = lt_ref[r][None, :]  # (1, H) f32
            l_mn = lmn_ref[r][None, :]
            l_mx = lmx_ref[r][None, :]
            rs = rrev[rows - r : rows - r + D]
            rmn = rmnrev[rows - r : rows - r + D]
            rmx = rmxrev[rows - r : rows - r + D]
            d_lr = jnp.maximum(0.0, jnp.maximum(lt - rmx, rmn - lt))
            d_rl = jnp.maximum(0.0, jnp.maximum(rs - l_mx, l_mn - rs))
            bt = jnp.minimum(jnp.minimum(d_lr, d_rl), bt_clip)
            cost_f = cost_f + bt_weight * bt

        cost_f = jnp.where(d_iota > x, worst, cost_f)
        out_ref[r] = _store_scaled(cost_f, scale, out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_disparities", "census_window", "bt_weight", "bt_clip",
        "block_rows", "interpret", "out_dtype",
    ),
)
def fused_cost_volume_pallas_wdh(
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disparities: int,
    census_window: Tuple[int, int] = (7, 9),
    bt_weight: float = 0.25,
    bt_clip: float = 32.0,
    block_rows: int = 32,
    interpret: bool = False,
    out_dtype="int16",
) -> jnp.ndarray:
    """(W, D, H) int16 census+BT cost volume — ``transpose(hdw, (2,1,0))``
    of :func:`fused_cost_volume_pallas_hdw`, built directly (bit-exact,
    zero lane rolls). Producer for the horizontal sweeps of
    ``sgm_pallas.sgm_extract_fused_hdw``."""
    h, w = left.shape
    D = num_disparities
    R = block_rows
    if w % R != 0:
        raise ValueError(f"W={w} must be divisible by block_rows={R}")
    wh, ww = census_window
    n_bits = wh * ww - 1
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    cl = census_transform(left, census_window)  # (H, W, P) uint32
    cr = census_transform(right, census_window)
    n_planes = cl.shape[-1]

    def half_pix_bounds(img):
        lh = 0.5 * (img + jnp.roll(img, 1, axis=-1))
        rh = 0.5 * (img + jnp.roll(img, -1, axis=-1))
        return (jnp.minimum(jnp.minimum(lh, rh), img),
                jnp.maximum(jnp.maximum(lh, rh), img))

    l_mn, l_mx = half_pix_bounds(left)
    r_mn, r_mx = half_pix_bounds(right)

    nb = w // R
    n_views = 1 + -(-(D + 1) // R)  # window is R+D+1 rows from block-aligned lo
    ext_blocks = nb + n_views - 1

    def rev_ext(img_t):
        # ext[g]: g=0 -> row 0 (the circular r[-1] partner of jnp.roll);
        # g in [1, W] -> reversed rows; beyond -> circular continuation;
        # zero-pad to ext_blocks*R rows (never read).
        rev = img_t[::-1]
        ext = jnp.concatenate([img_t[:1], rev, rev[:D]], axis=0)
        pad = ext_blocks * R - ext.shape[0]
        return jnp.pad(ext, ((0, pad), (0, 0)))

    cl_t = [jnp.transpose(cl[..., p]) for p in range(n_planes)]  # (W, H)
    crev = [rev_ext(jnp.transpose(cr[..., p])) for p in range(n_planes)]
    rrev = rev_ext(jnp.transpose(right))
    lt_t = jnp.transpose(left)
    lmn_t = jnp.transpose(l_mn)
    lmx_t = jnp.transpose(l_mx)

    idx_blk = lambda i: (i, 0)
    spec_blk = pl.BlockSpec((R, h), idx_blk, memory_space=pltpu.VMEM)
    view_specs = [
        pl.BlockSpec((R, h), (lambda k: (lambda i: (nb - 1 - i + k, 0)))(k),
                     memory_space=pltpu.VMEM)
        for k in range(n_views)
    ]
    # each reversed array is passed n_views times (one per shifted view)
    operands = [*cl_t, lt_t, lmn_t, lmx_t]
    in_specs = [spec_blk] * len(operands)
    for c in crev:
        operands.extend([c] * n_views)
        in_specs.extend(view_specs)
    operands.extend([rrev] * n_views)
    in_specs.extend(view_specs)
    if bt_weight > 0.0:
        for arr in (rev_ext(jnp.transpose(r_mn)), rev_ext(jnp.transpose(r_mx))):
            operands.extend([arr] * n_views)
            in_specs.extend(view_specs)

    odt = jnp.dtype(out_dtype)
    if odt == jnp.int8 and not int8_cost_fits(census_window, bt_weight, bt_clip):
        raise ValueError(
            f"census window {census_window} + bt overflows int8; use int16"
        )
    return pl.pallas_call(
        functools.partial(
            _wdh_kernel, rows=R, n_disp=D, n_planes=n_planes,
            n_views=n_views, n_bits=n_bits, bt_weight=float(bt_weight),
            bt_clip=float(bt_clip), scale=cost_scale_for(odt),
        ),
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, D, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w, D, h), odt),
        # the out block is (R, D, H): at large D (cascade flat-oracle runs
        # at D=256) it overflows the default 16 MB scoped-vmem limit
        # (measured 18.85 MB at 768x256x540 int8); v5e has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_disparities", "census_window", "bt_weight", "bt_clip",
        "interpret", "out_dtype",
    ),
)
def fused_cost_volume_pallas_hdw(
    left: jnp.ndarray,
    right: jnp.ndarray,
    num_disparities: int,
    census_window: Tuple[int, int] = (7, 9),
    bt_weight: float = 0.25,
    bt_clip: float = 32.0,
    interpret: bool = False,
    out_dtype="int16",
) -> jnp.ndarray:
    """(H, D, W) int16 fixed-point census+BT cost volume (scale 4).

    Drop-in producer for ``sgm_aggregate_pallas_hdw`` /
    ``extract_disparity_hdw`` when ``CostConfig.dtype == "int16"``."""
    h, w = left.shape
    wh, ww = census_window
    n_bits = wh * ww - 1
    left = left.astype(jnp.float32)
    right = right.astype(jnp.float32)
    cl = census_transform(left, census_window)  # (H, W, P) uint32
    cr = census_transform(right, census_window)
    n_planes = cl.shape[-1]

    def half_pix_bounds(img):
        lh = 0.5 * (img + jnp.roll(img, 1, axis=-1))
        rh = 0.5 * (img + jnp.roll(img, -1, axis=-1))
        return (jnp.minimum(jnp.minimum(lh, rh), img),
                jnp.maximum(jnp.maximum(lh, rh), img))

    # left bounds precomputed (never shifted); the RIGHT bounds are derived
    # in-kernel from the shifted right image itself (see _cost_kernel)
    l_mn, l_mx = half_pix_bounds(left)

    rows = 8
    nblocks = pl.cdiv(h, rows)
    idx3 = lambda i: (i, 0, 0)
    idx2 = lambda i: (i, 0)
    spec_img = lambda: pl.BlockSpec((rows, w), idx2, memory_space=pltpu.VMEM)
    cl_planes = [cl[..., p] for p in range(n_planes)]
    cr_planes = [cr[..., p] for p in range(n_planes)]
    operands = [*cl_planes, *cr_planes, left, l_mn, l_mx, right]
    odt = jnp.dtype(out_dtype)
    if odt == jnp.int8 and not int8_cost_fits(census_window, bt_weight, bt_clip):
        raise ValueError(
            f"census window {census_window} + bt overflows int8; use int16"
        )
    return pl.pallas_call(
        functools.partial(
            _cost_kernel, rows=rows, n_disp=num_disparities,
            n_planes=n_planes, n_bits=n_bits,
            bt_weight=float(bt_weight), bt_clip=float(bt_clip),
            scale=cost_scale_for(odt),
        ),
        grid=(nblocks,),
        in_specs=[spec_img() for _ in operands],
        out_specs=pl.BlockSpec((rows, num_disparities, w), idx3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, num_disparities, w), odt),
        interpret=interpret,
    )(*operands)

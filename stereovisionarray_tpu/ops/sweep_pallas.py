"""Fused translation-only plane-sweep census kernel (MXU one-hot warp).

Replaces the XLA per-plane chain of ``models/plane_sweep.py`` (pad ->
4 dynamic slices -> bilinear lerp -> census -> hamming -> view fusion) for
the translation-only camera arrays the reference uses
(``/root/reference/src/functions.cpp:55-103`` builds per-plane shifted
SADs the same way, pixel by pixel).

Why a kernel: the XLA sweep measures ~9 ms/frame-set at 4 views x 128
planes x 270x360 — half of it dynamic-slice materialization
(scripts/probe_sweep_stages.py: warp 4.6 ms of 8.9). Every data-dependent
offset mechanism in Mosaic crashes this v5e toolchain
(scripts/probe_dma_warp2.py), so the warp instead rides the MXU with ZERO
dynamic offsets (scripts/probe_matmul_warp.py, 2.1 us/warp):

    window = Sy @ src @ Sx
    Sy[r, p] = (p == y0 + r),  Sx[p, c] = (p == x0 + c)   (0/1 one-hot)

The one-hot selections are bf16-exact, and ``src = f32(hi) + f32(lo)``
splits exactly into two bf16 terms, so two bf16 MXU passes per axis
reproduce the f32 gather EXACTLY for values with <= 16 significant bits
(all uint8-sourced imagery; arbitrary floats see a 2^-16-relative
residual that can flip census bits where |neighbour - centre| is below
~1e-3 — flat-region noise bits with no measured effect on golden
depth metrics). The fractional bilinear lerp runs on the VPU in f32 with
the same operation order as ``models.plane_sweep._shift_warp``. The
window carries a ``patch//2`` margin so the census neighbours come from
REAL shifted content via static slices — the only other divergence from
the XLA path, which edge-clamps the warped image: integer-image maps are
bit-identical in the interior (verified on-device by
``scripts/check_tpu_parity.py``) and may differ in the outermost
patch//2 border ring.

All sources stay VMEM-resident across the plane grid (constant block
index maps); HBM traffic is one source read + the fused volume write.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["plane_sweep_census_pallas"]

# view count above which the per-view-unrolled kernel's live temporaries
# exceed VMEM (~230 MB at 24 views x pad 93) and the 2D-grid variant runs
_UNROLL_MAX_VIEWS = 8
# views resident per grid step in the many-view kernel (probe on device:
# scripts/probe_topk_kernel.py --chunk sweep; bounded by VMEM temporaries
# ~10 MB/view)
_GRID_VIEW_CHUNK = 6


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _sweep_kernel(sc_ref, f_ref, *rest, n_views, h, w, margin, patch,
                  pad_total, n_bits, valid_mean, axis_flags, use_lo,
                  topk=None):
    if use_lo:
        hi_ref, lo_ref, sgn_ref, base_ref, fused_ref, nv_ref = rest
    else:
        # 8-bit sources: integers <= 255 are bf16-EXACT, so the lo residual
        # plane is identically zero — its operand, VMEM residency, and every
        # lo matmul arm are dropped (half the kernel's MXU work)
        hi_ref, sgn_ref, base_ref, fused_ref, nv_ref = rest
        lo_ref = None
    d = pl.program_id(0)
    M = margin
    hp = hi_ref.shape[1]
    wp = hi_ref.shape[2]
    hm = h + 2 * M + 1  # gathered rows (census margin + lerp partner)
    wm = w + 2 * M + 1

    # int iota + cast: tpu.iota only produces integer vectors
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    ceiling = jnp.float32(patch * patch - 1)

    fused = jnp.zeros((h, w), jnp.float32)
    nv = jnp.zeros((h, w), jnp.int32)
    # streaming top-k: k ascending slots, each view's cost insertion-sorted
    # in (2k min/max passes) — O(k) VMEM, no (S, h, w) cost stack, ~17%
    # extra VPU work over the mean path at S=24/k=6. BIG-initialized slots
    # are fully displaced whenever S >= k (callers route k >= S to mean).
    slots = tuple(jnp.full((h, w), 1e30, jnp.float32) for _ in range(topk or 0))

    def _accumulate(carry, ham, ok):
        fused, nv, slots = carry
        if topk:
            # cfg.fusion == "topk_mean", k < S: k smallest ceiling-padded
            # costs (matches _fuse_views' -top_k(-costs); the mean of the
            # k smallest is tie-order invariant, and the slots stay sorted
            # ascending so the final sum order matches jnp.mean over
            # top_k's ascending output)
            v = jnp.where(ok, ham, ceiling)
            new_slots = []
            for t in slots:
                lo = jnp.minimum(t, v)
                v = jnp.maximum(t, v)
                new_slots.append(lo)
            slots = tuple(new_slots)
        elif valid_mean:
            # cfg.fusion == "mean": average over the VALID views only
            # (matches _fuse_views: sum(where(ok, c, 0)) / max(count, 1))
            fused = fused + jnp.where(ok, ham, 0.0)
        else:
            # topk_mean with k >= S: plain mean with ceiling-padded
            # out-of-view entries (matches jnp.mean over where(ok, c, ceil))
            fused = fused + jnp.where(ok, ham, ceiling)
        return fused, nv + ok.astype(jnp.int32), slots

    def _view_ham_ok(s, y0, x0, fv, fu, flag):
        return _warp_census_ham(
            hi_ref[s], lo_ref[s] if use_lo else None, sgn_ref, base_ref,
            y0, x0, fv, fu, flag, h=h, w=w, margin=M, pad_total=pad_total,
        )

    for s in range(n_views):
        ham, ok = _view_ham_ok(
            s, sc_ref[d, s, 0], sc_ref[d, s, 1],
            f_ref[d, s, 0], f_ref[d, s, 1], axis_flags[s],
        )
        fused, nv, slots = _accumulate((fused, nv, slots), ham, ok)

    if topk:
        acc = slots[0]
        for i in range(1, topk):
            acc = acc + slots[i]
        fused_ref[0] = acc / jnp.float32(topk)
    elif valid_mean:
        fused_ref[0] = fused / jnp.maximum(nv, 1).astype(jnp.float32)
    else:
        fused_ref[0] = fused / jnp.float32(n_views)  # jnp.mean order
    nv_ref[0] = nv


def _warp_census_ham(hi2d, lo2d, sgn_ref, base_ref, y0, x0, fv, fu, flag,
                     *, h, w, margin, pad_total):
    """One view's warp + census + signed-select hamming + validity, on 2D
    padded-source planes (``hi2d``/``lo2d``: (hp, wp) bf16; ``lo2d`` None
    for 8-bit-exact sources). Shared by the unrolled kernel
    (``_sweep_kernel``) and the many-view 2D-grid kernel
    (``_sweep_kernel_grid_views``). Returns (ham, ok), both (h, w)."""
    M = margin
    use_lo = lo2d is not None
    hp, wp = hi2d.shape
    hm = h + 2 * M + 1
    wm = w + 2 * M + 1
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    # exact gather: rows y0..y0+hm-1, cols x0..x0+wm-1. The general
    # mechanism is one-hot MXU selection per axis (the only legal
    # dynamic-offset form on this toolchain — module docstring), but an
    # axis whose shift is STATICALLY zero for every plane (the CROSS
    # rig: each source moves along exactly one axis) collapses to a
    # free static slice: y0 = pad_total - M is then a compile-time
    # constant, and selecting rows of hi/lo by slice is bit-identical
    # to the bf16 one-hot matmul (0/1 weights select exactly).
    if flag == "x":  # sv == 0 for all planes -> static row window:
        # the original bf16 hi/lo operands sliced by rows feed the
        # column matmuls directly — no f32 combine + re-split, and the
        # sum dot(hi_rows, sx) + dot(lo_rows, sx) equals the one-hot
        # column selection of f32(hi) + f32(lo) exactly
        Y0 = pad_total - M
        cp = jax.lax.broadcasted_iota(jnp.int32, (wp, wm), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (wp, wm), 1)
        sx = (cp == x0 + cc).astype(jnp.bfloat16)
        b = _dot(hi2d[Y0 : Y0 + hm, :], sx)  # (hm, wm) f32
        if use_lo:
            b = b + _dot(lo2d[Y0 : Y0 + hm, :], sx)
    else:
        rp = jax.lax.broadcasted_iota(jnp.int32, (hm, hp), 1)
        rr = jax.lax.broadcasted_iota(jnp.int32, (hm, hp), 0)
        sy = (rp == y0 + rr).astype(jnp.bfloat16)
        a = _dot(sy, hi2d)  # (hm, wp) f32
        if use_lo:
            a = a + _dot(sy, lo2d)
        if flag == "y":  # su == 0 everywhere -> static column window
            # exact (no re-split residual): a[:, X0:X0+wm] IS the window
            X0 = pad_total - M
            b = a[:, X0 : X0 + wm]
        else:
            cp = jax.lax.broadcasted_iota(jnp.int32, (wp, wm), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (wp, wm), 1)
            sx = (cp == x0 + cc).astype(jnp.bfloat16)
            a_hi = a.astype(jnp.bfloat16)
            if use_lo:
                a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                b = _dot(a_hi, sx) + _dot(a_lo, sx)  # (hm, wm) f32
            else:
                # a is a one-hot selection of 8-bit-exact values: the
                # bf16 round-trip is exact, no residual arm needed
                b = _dot(a_hi, sx)

    # bilinear lerp, same op order as _shift_warp (bit-compat interior).
    # A statically-zero fractional component drops its lerp arm: with
    # fv == 0, top*(1-fv) + bot*fv == top bit-for-bit (x*1.0 == x,
    # x + bot*0.0 == x up to the sign of zero, which census < ignores).
    if flag == "x":  # fv == 0
        wmg = b[:-1, :-1] * (1.0 - fu) + b[:-1, 1:] * fu
    elif flag == "y":  # fu == 0
        wmg = b[:-1, :-1] * (1.0 - fv) + b[1:, :-1] * fv
    else:
        top = b[:-1, :-1] * (1.0 - fu) + b[:-1, 1:] * fu
        bot = b[1:, :-1] * (1.0 - fu) + b[1:, 1:] * fu
        wmg = top * (1.0 - fv) + bot * fv  # (h+2M, w+2M) margin-warped

    # Hamming accumulates DIRECTLY against the reference census as a
    # signed-select sum: per bit, XOR(warped_bit, ref_bit) equals
    # ref_bit + (1 - 2*ref_bit) * warped_bit, so with the precomputed
    # sign planes sgn_ref = 1 - 2*ref_bit (f32) and their per-pixel sum
    # base_ref = sum(ref_bits), each bit costs compare+select+add (the
    # earlier cmp/cast/sub/abs/add i32 form was ~5 VPU ops). All values
    # are small integers in f32 — exact, same hamming to the bit. The
    # classical pack-then-popcount form miscompiles on this v5e
    # toolchain: a 24-deep u32 `cur | (mask << bit)` chain silently
    # drops bits 16-18/20-22 on device (each offset is exact in
    # isolation, every packing variant — select-of-constants, i32
    # shifts, per-dy subchains — fails identically; interpret mode is
    # correct). Per-bit adds are immune; see the module docstring.
    center = wmg[M : M + h, M : M + w]
    acc = jnp.zeros((h, w), jnp.float32)
    bit = 0
    for dy in range(-M, M + 1):
        for dx in range(-M, M + 1):
            if dy == 0 and dx == 0:
                continue
            nb = wmg[M + dy : M + dy + h, M + dx : M + dx + w]
            acc = acc + jnp.where(nb < center, sgn_ref[bit], 0.0)
            bit += 1
    ham = base_ref[...] + acc  # exact integer-valued f32 hamming

    # out-of-view mask: identical float math to the XLA per_plane
    su = (x0 - pad_total + M).astype(jnp.float32) + fu
    sv = (y0 - pad_total + M).astype(jnp.float32) + fv
    ok = (
        (u_iota + su >= 0.0)
        & (u_iota + su <= w - 1.0)
        & (v_iota + sv >= 0.0)
        & (v_iota + sv <= h - 1.0)
    )
    return ham, ok


def _sweep_kernel_grid_views(sc_ref, f_ref, *rest, n_views, h, w, margin,
                             patch, pad_total, n_bits, valid_mean, use_lo,
                             topk=None):
    """Many-view variant of :func:`_sweep_kernel`: grid = (planes, views),
    ONE view's warp + census per grid step, accumulated in VMEM scratch
    (the SGM kernels' scratch-carry pattern). The unrolled kernel keeps
    every view's temporaries live at once (~230 MB scoped VMEM at 24 views
    x pad 93 — OOMs the chip) and a lax.fori_loop over views with dynamic
    leading-axis ref reads blows SMEM (1.5 MB of 1) — both measured,
    probe_topk_kernel.py. Sources are NOT VMEM-resident here: each (plane,
    view) step DMAs its view's padded block (D x S re-fetches — the price
    of bounded VMEM; the configs this serves had NO kernel path at all).
    """
    if use_lo:
        hi_ref, lo_ref, sgn_ref, base_ref, fused_ref, nv_ref, acc_ref, nv_acc = rest
    else:
        hi_ref, sgn_ref, base_ref, fused_ref, nv_ref, acc_ref, nv_acc = rest
        lo_ref = None
    s = pl.program_id(1)
    ceiling = jnp.float32(patch * patch - 1)

    @pl.when(s == 0)
    def _init():
        acc_ref[...] = jnp.full(acc_ref.shape, 1e30 if topk else 0.0,
                                jnp.float32)
        nv_acc[...] = jnp.zeros(nv_acc.shape, jnp.int32)

    ham, ok = _warp_census_ham(
        hi_ref[0], lo_ref[0] if use_lo else None, sgn_ref, base_ref,
        sc_ref[0, s, 0], sc_ref[0, s, 1], f_ref[0, s, 0], f_ref[0, s, 1],
        None, h=h, w=w, margin=margin, pad_total=pad_total,
    )
    if topk:
        v = jnp.where(ok, ham, ceiling)
        for i in range(topk):
            t = acc_ref[i]
            acc_ref[i] = jnp.minimum(t, v)
            v = jnp.maximum(t, v)
    elif valid_mean:
        acc_ref[0] = acc_ref[0] + jnp.where(ok, ham, 0.0)
    else:
        acc_ref[0] = acc_ref[0] + jnp.where(ok, ham, ceiling)
    nv_acc[...] = nv_acc[...] + ok.astype(jnp.int32)

    @pl.when(s == n_views - 1)
    def _emit():
        nv = nv_acc[...]
        if topk:
            tot = acc_ref[0]
            for i in range(1, topk):
                tot = tot + acc_ref[i]
            fused_ref[0] = tot / jnp.float32(topk)
        elif valid_mean:
            fused_ref[0] = acc_ref[0] / jnp.maximum(nv, 1).astype(jnp.float32)
        else:
            fused_ref[0] = acc_ref[0] / jnp.float32(n_views)
        nv_ref[0] = nv


def _sweep_kernel_grid_chunk(sc_ref, f_ref, *rest, n_views, chunk, n_steps,
                             h, w, margin, patch, pad_total, n_bits,
                             valid_mean, use_lo, topk=None):
    """View-CHUNKED grid variant (VERDICT r4 item 3): grid =
    (planes, ceil(S/chunk)), ``chunk`` views resident per step — between
    the all-resident unrolled kernel (OOMs VMEM beyond ~8 views) and the
    one-view-per-step streamer (D*S refetches + D*S grid-step overhead).
    Views are padded to a chunk multiple with sentinel shifts (one-hot
    window selects nothing, ok=False -> they contribute the ceiling like
    any out-of-view source)."""
    if use_lo:
        hi_ref, lo_ref, sgn_ref, base_ref, fused_ref, nv_ref, acc_ref, nv_acc = rest
    else:
        hi_ref, sgn_ref, base_ref, fused_ref, nv_ref, acc_ref, nv_acc = rest
        lo_ref = None
    st = pl.program_id(1)
    ceiling = jnp.float32(patch * patch - 1)

    @pl.when(st == 0)
    def _init():
        acc_ref[...] = jnp.full(acc_ref.shape, 1e30 if topk else 0.0,
                                jnp.float32)
        nv_acc[...] = jnp.zeros(nv_acc.shape, jnp.int32)

    for g in range(chunk):
        vi = st * chunk + g
        ham, ok = _warp_census_ham(
            hi_ref[g], lo_ref[g] if use_lo else None, sgn_ref, base_ref,
            sc_ref[0, vi, 0], sc_ref[0, vi, 1], f_ref[0, vi, 0],
            f_ref[0, vi, 1], None, h=h, w=w, margin=margin,
            pad_total=pad_total,
        )
        if topk:
            v = jnp.where(ok, ham, ceiling)
            for i in range(topk):
                t = acc_ref[i]
                acc_ref[i] = jnp.minimum(t, v)
                v = jnp.maximum(t, v)
        elif valid_mean:
            acc_ref[0] = acc_ref[0] + jnp.where(ok, ham, 0.0)
        else:
            acc_ref[0] = acc_ref[0] + jnp.where(ok, ham, ceiling)
        nv_acc[...] = nv_acc[...] + ok.astype(jnp.int32)

    @pl.when(st == n_steps - 1)
    def _emit():
        nv = nv_acc[...]
        if topk:
            tot = acc_ref[0]
            for i in range(1, topk):
                tot = tot + acc_ref[i]
            fused_ref[0] = tot / jnp.float32(topk)
        elif valid_mean:
            fused_ref[0] = acc_ref[0] / jnp.maximum(nv, 1).astype(jnp.float32)
        else:
            fused_ref[0] = acc_ref[0] / jnp.float32(n_views)
        nv_ref[0] = nv


def _static_axis_flags(shifts) -> Optional[Tuple[Optional[str], ...]]:
    """Per-view axis flag when `shifts` is concrete at trace time.

    NOTE: in the library pipelines this is almost never the case —
    ``plane_sweep_volume`` is jitted with the cameras as a traced pytree,
    so the shifts reach this call site as tracers and the answer is None.
    Callers that want the static fast path must compute the flags
    host-side from the concrete rig
    (``models.plane_sweep.translation_axis_flags``, the pattern of
    ``_shift_warp_pad``) and pass them through ``plane_sweep_volume``'s
    ``axis_flags`` static argument. This fallback only fires for direct
    kernel calls with concrete shift arrays (tests, probes).

    'x' = the view's sv shift is exactly 0 for EVERY plane (motion along x
    only — both CROSS arms and the grid's axis rows/cols), 'y' = su is 0
    everywhere, None = general.
    """
    if isinstance(shifts, jax.core.Tracer):
        return None  # no host transfer attempt for traced values
    try:
        sh = np.asarray(shifts)
    except (jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        return None
    flags = []
    for s in range(sh.shape[1]):
        if np.all(sh[:, s, 1] == 0.0):
            flags.append("x")
        elif np.all(sh[:, s, 0] == 0.0):
            flags.append("y")
        else:
            flags.append(None)
    return tuple(flags)


def plane_sweep_census_pallas(
    ref: jnp.ndarray,
    src_images: jnp.ndarray,
    shifts: jnp.ndarray,
    patch: int = 5,
    shift_pad: int = 0,
    valid_mean: bool = False,
    interpret: bool = False,
    axis_flags: Optional[Tuple[Optional[str], ...]] = None,
    sources_8bit: bool = False,
    topk: Optional[int] = None,
    view_chunk: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused census plane sweep over uniform per-(plane, view) shifts.

    ref: (H, W) reference image; src_images: (S, H, W); shifts: (D, S, 2)
    pixel translations (su, sv) with |shift| <= shift_pad; patch: odd
    census window size. valid_mean=False reproduces ``fusion="topk_mean"``
    with ``topk >= S`` (plain mean, out-of-view views contribute the cost
    ceiling); valid_mean=True reproduces ``fusion="mean"`` (average over
    the in-view sources only); topk=k (1 <= k < S) reproduces
    ``fusion="topk_mean"`` with k BELOW the view count — the
    occlusion-robust default — via a streaming k-slot insertion sort
    (O(k) VMEM, no (S, H, W) cost stack).

    Returns ``(fused, nviews)``, each (D, H, W) — fused f32 census cost
    (out-of-view views contribute the cost ceiling), nviews int32.
    Matches the XLA ``plane_sweep_volume`` fast path bit-for-bit in the
    interior (border ring of ``patch//2`` px: the kernel censuses real
    shifted content where XLA edge-clamps the warped image).
    """
    if topk is not None and not (1 <= topk < src_images.shape[0]):
        raise ValueError("topk must be in [1, n_views); use the mean path "
                         "for k >= n_views")
    flags = axis_flags if axis_flags is not None else _static_axis_flags(shifts)
    if flags is None:
        flags = (None,) * src_images.shape[0]
    return _census_sweep_impl(
        ref, src_images, shifts, patch=patch, shift_pad=shift_pad,
        valid_mean=valid_mean, interpret=interpret, axis_flags=flags,
        sources_8bit=bool(sources_8bit),
        topk=int(topk) if topk is not None else None,
        view_chunk=int(view_chunk) if view_chunk is not None else None,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "patch", "shift_pad", "valid_mean", "interpret", "axis_flags",
        "sources_8bit", "topk", "view_chunk",
    ),
)
def _census_sweep_impl(
    ref, src_images, shifts, *, patch, shift_pad, valid_mean, interpret,
    axis_flags, sources_8bit=False, topk=None, view_chunk=None,
):
    s_views, h, w = src_images.shape
    d_planes = shifts.shape[0]
    M = patch // 2
    n_bits = patch * patch - 1

    P = shift_pad + M + 1
    padded = jnp.pad(
        src_images.astype(jnp.float32), ((0, 0), (P, P), (P, P))
    )
    hi = padded.astype(jnp.bfloat16)
    # sources_8bit: the caller asserts integer-valued [0, 255] sources
    # (decoded uint8 frames) — then hi is EXACT and the lo residual plane
    # is identically zero; skip it (operand + half the warp matmuls)
    lo = (
        None if sources_8bit
        else (padded - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    )

    # integer/fractional split — float math identical to _shift_warp's
    su = shifts[..., 0].astype(jnp.float32)  # (D, S)
    sv = shifts[..., 1].astype(jnp.float32)
    i0 = jnp.floor(su)
    j0 = jnp.floor(sv)
    fu = su - i0
    fv = sv - j0
    x0 = P + i0.astype(jnp.int32) - M  # margin-window origin
    y0 = P + j0.astype(jnp.int32) - M
    sc = jnp.stack([y0, x0], axis=-1)  # (D, S, 2) int32
    fr = jnp.stack([fv, fu], axis=-1).astype(jnp.float32)

    # reference census as per-neighbour SIGN planes (1 - 2*bit) plus the
    # per-pixel bit-count base — the kernel accumulates hamming directly as
    # signed f32 selects (in-kernel u32 bit packing miscompiles on this
    # toolchain, see _sweep_kernel). Built DIRECTLY from the image as one
    # stacked (n_bits, H, W) comparison: the old census_transform+unpack
    # route cost ~220 tiny XLA ops, the dominant share of a measured ~3 ms
    # PER-CALL fixed cost (probe_cascade_stages2.py plane-count fit) that
    # dwarfed the coarse cascade pass. Bit order matches census_transform's
    # (dy, dx) enumeration; comparisons are the same edge-padded f32
    # neighbor < center, so the kernel output is bit-identical.
    ref32 = ref.astype(jnp.float32)
    pad_ref = jnp.pad(ref32, ((M, M), (M, M)), mode="edge")
    neighbors = jnp.stack(
        [
            jax.lax.slice(pad_ref, (dy + M, dx + M), (dy + M + h, dx + M + w))
            for dy in range(-M, M + 1)
            for dx in range(-M, M + 1)
            if not (dy == 0 and dx == 0)
        ]
    )  # (n_bits, H, W)
    refbits = (neighbors < ref32[None]).astype(jnp.int32)
    sgn = (1 - 2 * refbits).astype(jnp.float32)
    base = jnp.sum(refbits, axis=0).astype(jnp.float32)  # (H, W)

    hp, wp = padded.shape[1], padded.shape[2]
    resident3 = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out_spec = lambda dt: (
        pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((d_planes, h, w), dt),
    )
    (fspec, fshape), (nspec, nshape) = out_spec(jnp.float32), out_spec(jnp.int32)

    operands = [sc, fr, hi] + ([] if lo is None else [lo]) + [sgn, base]
    if s_views > _UNROLL_MAX_VIEWS:
        # many views: grid over (planes, views), one view per step,
        # scratch accumulation (_sweep_kernel_grid_views docstring — the
        # unrolled kernel OOMs VMEM beyond ~8 views). Sources stream per
        # step instead of staying resident; static axis flags don't apply
        # (the per-step body must be view-uniform).
        view_spec = pl.BlockSpec(
            (1, hp, wp), lambda i, s: (s, 0, 0), memory_space=pltpu.VMEM
        )
        res3 = lambda shape: pl.BlockSpec(
            shape, lambda i, s: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        out2 = lambda dt: (
            pl.BlockSpec((1, h, w), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct((d_planes, h, w), dt),
        )
        (fspec2, fshape2), (nspec2, nshape2) = out2(jnp.float32), out2(jnp.int32)
        # SMEM windows are 256 BYTES per element: the whole (D, S, 2)
        # scalar tables cost 768 KB each and blow the 1 MB SMEM budget at
        # 24 views x 64 planes (measured — probe_topk_kernel.py); stream
        # one plane's (S, 2) scalars per step instead (a (1,1,2) window
        # violates the lowering's minor-dims tiling rule)
        G = int(view_chunk) if view_chunk else _GRID_VIEW_CHUNK
        G = max(1, min(G, s_views))
        s_pad = -(-s_views // G) * G
        if s_pad != s_views:
            # sentinel views: shifts far out of range -> the one-hot
            # window selects nothing, ok=False, contributes the ceiling
            padv = s_pad - s_views
            hi = jnp.concatenate(
                [hi, jnp.zeros((padv, hp, wp), hi.dtype)], axis=0)
            if lo is not None:
                lo = jnp.concatenate(
                    [lo, jnp.zeros((padv, hp, wp), lo.dtype)], axis=0)
            sc = jnp.concatenate(
                [sc, jnp.full((d_planes, padv, 2), -30000, sc.dtype)],
                axis=1)
            fr = jnp.concatenate(
                [fr, jnp.zeros((d_planes, padv, 2), fr.dtype)], axis=1)
            operands = [sc, fr, hi] + ([] if lo is None else [lo]) + [sgn, base]
        n_steps = s_pad // G
        chunk_spec = pl.BlockSpec(
            (G, hp, wp), lambda i, s: (s, 0, 0), memory_space=pltpu.VMEM
        )
        smem_step = pl.BlockSpec(
            (1, s_pad, 2), lambda i, s: (i, 0, 0), memory_space=pltpu.SMEM
        )
        fused, nv = pl.pallas_call(
            functools.partial(
                _sweep_kernel_grid_chunk, n_views=s_views, chunk=G,
                n_steps=n_steps, h=h, w=w,
                margin=M, patch=patch, pad_total=P, n_bits=n_bits,
                valid_mean=bool(valid_mean), use_lo=lo is not None,
                topk=topk,
            ),
            grid=(d_planes, n_steps),
            in_specs=[
                smem_step,
                smem_step,
                *([chunk_spec] * (1 if lo is None else 2)),
                res3((n_bits, h, w)),
                res3((h, w)),
            ],
            out_specs=(fspec2, nspec2),
            out_shape=(fshape2, nshape2),
            scratch_shapes=[
                pltpu.VMEM((topk or 1, h, w), jnp.float32),
                pltpu.VMEM((h, w), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*operands)
        return fused, nv

    img_specs = [resident3((s_views, hp, wp))] * (1 if lo is None else 2)
    fused, nv = pl.pallas_call(
        functools.partial(
            _sweep_kernel, n_views=s_views, h=h, w=w, margin=M, patch=patch,
            pad_total=P, n_bits=n_bits, valid_mean=bool(valid_mean),
            axis_flags=axis_flags, use_lo=lo is not None, topk=topk,
        ),
        grid=(d_planes,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *img_specs,
            resident3((n_bits, h, w)),
            resident3((h, w)),
        ],
        out_specs=(fspec, nspec),
        out_shape=(fshape, nshape),
        # the unrolled views x census offsets need ~27 MB of kernel stack
        # at 270x360x4 views (default scoped-vmem limit is 16 MB; v5e has
        # 128 MB of VMEM and the resident operands use < 4 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return fused, nv

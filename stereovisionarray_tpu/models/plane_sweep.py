"""N-view plane-sweep depth over the camera array — BASELINE.json config 3.

The idiomatic generalization of the reference's multi-view machinery:
 - per-pair perspective warps (``/root/reference/src/functions.cpp:55-103``)
   become one 3x3 fronto-parallel-plane homography per (view, depth-plane),
   applied to the whole pixel grid as einsum + bilinear gather;
 - the pair topologies (``/root/reference/src/functions.cpp:148-213``) choose
   which array views contribute;
 - the +-5-step local photoconsistency refine
   (``improveWithDisparity``, ``/root/reference/src/functions.cpp:11-52``)
   becomes a dense sweep over D depth planes with robust multi-view cost
   fusion — instead of updating one disparity map pair-by-pair (last pair
   wins, reference bug §2.3.4), all views vote in one cost volume.

TPU mapping: the sweep is a ``lax.map`` over planes (bounds the (S, H, W)
warp intermediate), each plane a vmap over source views of
warp + census/SAD/ZNCC cost, fused over views by mean / top-k mean. The
resulting (H, W, D) volume feeds the same SGM aggregation as two-view
stereo — smoothness across *plane index* plays the role of disparity
smoothness — then WTA + parabola refinement in inverse-depth space.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from stereovisionarray_tpu.config import PlaneSweepConfig, SGMConfig
from stereovisionarray_tpu.geometry.camera import CameraArray
from stereovisionarray_tpu.geometry.epipolar import inverse_depth_samples
from stereovisionarray_tpu.ops.census import census_transform, hamming_distance
from stereovisionarray_tpu.ops.sgm import sgm_aggregate
from stereovisionarray_tpu.ops.warp import homography_warp
from stereovisionarray_tpu.ops.wta import winner_take_all, subpixel_refine


class PlaneSweepOutput(NamedTuple):
    depth: jnp.ndarray  # (H, W) float32 fused depth, 0 where invalid
    plane: jnp.ndarray  # (H, W) float32 fractional winning plane index
    cost: jnp.ndarray  # (H, W) winning fused cost
    valid: jnp.ndarray  # (H, W) bool
    num_views: jnp.ndarray  # (H, W) int32 valid views at the winning plane
    confidence: Optional[jnp.ndarray] = None  # (H, W) PKRN in [0,1), 0 invalid


def _box_filter(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(.., H, W) mean filter with a k x k window via two separable cumsum
    passes (edge-padded) — O(HW) independent of k."""
    if k <= 1:
        return x
    p = k // 2

    def along(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (p + 1, p)
        ap = jnp.pad(a, pad, mode="edge")
        c = jnp.cumsum(ap, axis=axis)
        upper = jax.lax.slice_in_dim(c, k, k + a.shape[axis], axis=axis)
        lower = jax.lax.slice_in_dim(c, 0, a.shape[axis], axis=axis)
        return (upper - lower) / k

    return along(along(x, -1), -2)


def translation_shifts(
    cameras: CameraArray, ref_index: int, src, depths: jnp.ndarray
) -> jnp.ndarray:
    """(S, D, 2) exact per-plane pixel shifts (su, sv) for the
    translation-only fast path: warping source s to the reference at plane
    depth d samples ``src(u + su, v + sv)`` with

        su(d) = fx * (t_src - t_ref).x / d + (cx_s - cx_r)

    (and sv analogously). Algebraically this IS the fronto-plane
    homography's (H[0,2]/H[2,2], H[1,2]/H[2,2]) for the R = I, equal-focal,
    equal-z rigs the ``shift_pad > 0`` gate admits, but computed WITHOUT
    the K^{-1} matrix round trip: the homography chain leaves
    ``fx * (cx/fx) != cx`` dirt of ~1e-5 px in components that are exactly
    zero, which defeats the sweep kernel's static axis-aligned fast path
    (ops/sweep_pallas.py::_static_axis_flags) and slightly biases the warp.
    """
    src = jnp.atleast_1d(jnp.asarray(src))
    n = cameras.t.shape[0]
    fx = jnp.broadcast_to(cameras.fx, (n,))
    fy = jnp.broadcast_to(cameras.fy, (n,))
    cx = jnp.broadcast_to(cameras.cx, (n,))
    cy = jnp.broadcast_to(cameras.cy, (n,))
    t_rel = cameras.t[src] - cameras.t[ref_index]  # (S, 3); R == I gate
    inv_d = 1.0 / depths  # (D,)
    su = fx[src][:, None] * t_rel[:, 0:1] * inv_d[None, :] + (
        cx[src] - cx[ref_index]
    )[:, None]
    sv = fy[src][:, None] * t_rel[:, 1:2] * inv_d[None, :] + (
        cy[src] - cy[ref_index]
    )[:, None]
    return jnp.stack([su, sv], axis=-1)


def translation_axis_flags(cameras, ref_index, src_indices):
    """HOST-SIDE per-view axis flags for the Pallas sweep kernel's static
    fast path, or None when the cameras are traced (then the kernel keeps
    the fully dynamic one-hot warp for every view).

    Must be called OUTSIDE jit on a concrete camera array (the pattern of
    ``array_pipeline._shift_warp_pad``): inside ``plane_sweep_volume`` the
    cameras are a traced pytree, so the kernel-side concretization attempt
    (``sweep_pallas._static_axis_flags``) always fails there — the flags
    have to be computed from the concrete rig and plumbed through as a
    static argument. 'x' = sv(d) == 0 for EVERY plane (the view moves along
    x only: t_rel.y == 0 and equal cy — see :func:`translation_shifts`),
    'y' symmetrically, None = general motion."""
    import numpy as np

    if isinstance(cameras.t, jax.core.Tracer):
        return None  # traced cameras -> no static flags
    try:
        t = np.asarray(cameras.t)
        n = t.shape[0]
        cx = np.broadcast_to(np.asarray(cameras.cx), (n,))
        cy = np.broadcast_to(np.asarray(cameras.cy), (n,))
    except (jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        return None
    flags = []
    for s in [int(i) for i in np.atleast_1d(np.asarray(src_indices))]:
        if t[s, 1] == t[ref_index, 1] and cy[s] == cy[ref_index]:
            flags.append("x")
        elif t[s, 0] == t[ref_index, 0] and cx[s] == cx[ref_index]:
            flags.append("y")
        else:
            flags.append(None)
    return tuple(flags)


def _view_cost(
    ref: jnp.ndarray,
    ref_census: Optional[jnp.ndarray],
    warped: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: PlaneSweepConfig,
    dtype,
) -> jnp.ndarray:
    """Photoconsistency cost of one warped view against the reference.
    Invalid (out-of-view) pixels get the cost ceiling so fusion ignores them
    via the top-k (reference instead skipped them pixel-by-pixel,
    ``/root/reference/src/CameraStereoVision.cpp:66-71``)."""
    if cfg.cost == "census":
        wc = census_transform(warped, (cfg.patch, cfg.patch))
        c = hamming_distance(ref_census, wc, dtype=dtype)
        ceiling = jnp.asarray(cfg.patch * cfg.patch - 1, dtype)
    elif cfg.cost == "sad":
        c = _box_filter(jnp.abs(ref - warped), cfg.patch)
        ceiling = jnp.asarray(255.0, dtype)
    elif cfg.cost == "zncc":
        mu_r = _box_filter(ref, cfg.patch)
        mu_w = _box_filter(warped, cfg.patch)
        var_r = _box_filter(ref * ref, cfg.patch) - mu_r * mu_r
        var_w = _box_filter(warped * warped, cfg.patch) - mu_w * mu_w
        cov = _box_filter(ref * warped, cfg.patch) - mu_r * mu_w
        ncc = cov * jax.lax.rsqrt(jnp.maximum(var_r * var_w, 1e-6))
        c = 1.0 - jnp.clip(ncc, -1.0, 1.0)  # in [0, 2]
        ceiling = jnp.asarray(2.0, dtype)
    else:
        raise ValueError(f"unknown plane-sweep cost {cfg.cost!r}")
    return jnp.where(valid, c, ceiling), ceiling


def _fuse_views(
    costs: jnp.ndarray, valids: jnp.ndarray, ceiling, cfg: PlaneSweepConfig
) -> jnp.ndarray:
    """Fuse per-view costs (S, H, W) -> (H, W). top-k mean over the best
    views is the standard occlusion-robust choice: an occluded view's high
    cost drops out of the k best."""
    if cfg.fusion == "min":
        return jnp.min(costs, axis=0)
    if cfg.fusion == "mean":
        n = jnp.maximum(jnp.sum(valids, axis=0), 1)
        return jnp.sum(jnp.where(valids, costs, 0.0), axis=0) / n
    if cfg.fusion == "topk_mean":
        k = min(cfg.topk, costs.shape[0])
        if k == costs.shape[0]:
            # top-k of all views is a plain mean — skip the TPU-expensive
            # sort network of lax.top_k entirely
            return jnp.mean(costs, axis=0)
        # k smallest = -(k largest of negated)
        top = -jax.lax.top_k(-jnp.moveaxis(costs, 0, -1), k)[0]  # (H, W, k)
        return jnp.mean(top, axis=-1)
    raise ValueError(f"unknown fusion {cfg.fusion!r}")


def _chunked_plane_map(per_plane, plane_args: jnp.ndarray, chunk: int):
    """lax.map over planes in vmapped chunks.

    One plane of work here is ~30 small ops on a (270, 360)-class image —
    per-kernel dispatch overhead dominates when lax.map runs them one plane
    at a time (measured 50 ms for 128 planes x 4 views on a v5e). Mapping
    over chunks of `chunk` planes with an inner vmap turns every op into a
    chunk-deep fused kernel: same peak-memory bound (one (chunk, S, H, W)
    warp stack) at a fraction of the dispatch count. The plane count is
    padded to a chunk multiple by repeating the last plane; the pad is
    sliced off after.
    """
    d = plane_args.shape[0]
    chunk = max(1, min(chunk, d))
    n_chunks = -(-d // chunk)
    pad = n_chunks * chunk - d
    if pad:
        plane_args = jnp.concatenate(
            [plane_args, jnp.repeat(plane_args[-1:], pad, axis=0)], axis=0
        )
    chunked = plane_args.reshape((n_chunks, chunk) + plane_args.shape[1:])
    outs = jax.lax.map(jax.vmap(per_plane), chunked)
    outs = jax.tree_util.tree_map(
        lambda x: x.reshape((n_chunks * chunk,) + x.shape[2:])[:d], outs
    )
    return outs


def _shift_warp(padded: jnp.ndarray, su, sv, h: int, w: int, pad: int):
    """Sample a `pad`-padded source image at a UNIFORM subpixel shift:
    out[y, x] = src[y + sv, x + su], bilinear.

    Four `dynamic_slice`s + lerp instead of a per-pixel gather — on TPU a
    general 2D gather serializes (measured: the homography-warp plane sweep
    spends ~16 s/frame-set in gathers at 5x5x270x360x128); contiguous
    dynamic slices are full-bandwidth copies. Used when every homography of
    the sweep is a pure translation (translation-only rigs — the reference
    geometry)."""
    j0 = jnp.floor(sv)
    i0 = jnp.floor(su)
    fv = sv - j0
    fu = su - i0
    y0 = (pad + j0).astype(jnp.int32)
    x0 = (pad + i0).astype(jnp.int32)

    def sl(dy, dx):
        return jax.lax.dynamic_slice(padded, (y0 + dy, x0 + dx), (h, w))

    top = sl(0, 0) * (1.0 - fu) + sl(0, 1) * fu
    bot = sl(1, 0) * (1.0 - fu) + sl(1, 1) * fu
    return top * (1.0 - fv) + bot * fv


@functools.partial(
    jax.jit,
    static_argnames=(
        "ref_index", "src_indices", "cfg", "shift_pad", "backend",
        "axis_flags",
    ),
)
def plane_sweep_volume(
    images: jnp.ndarray,
    cameras: CameraArray,
    ref_index: int,
    src_indices: tuple,
    cfg: PlaneSweepConfig = PlaneSweepConfig(),
    shift_pad: int = 0,
    depths: Optional[jnp.ndarray] = None,
    backend: str = "auto",
    axis_flags: Optional[tuple] = None,
    shifts: Optional[jnp.ndarray] = None,
) -> tuple:
    """Build the fused (H, W, D) plane-sweep cost volume and the per-plane
    valid-view counts (H, W, D).

    images: (N, H, W); src_indices: static tuple of source view ids.
    shift_pad: when > 0, use the translation-only fast path — every
    (view, plane) homography is treated as the pure pixel translation
    (H[0,2], H[1,2]) and warping becomes padded dynamic slices + lerp
    (valid for rigs with identical K and R; callers check, see
    ``array_depth_pipeline``). `shift_pad` must bound the largest |shift|.
    depths: optional explicit (D_local,) plane depths — the plane-sharding
    hook (parallel/plane_sweep.py): each ``disp`` mesh shard sweeps its own
    chunk of the inverse-depth samples (planes are independent, so the
    plane axis shards with NO halo); default = the full cfg sample set.
    shifts: optional explicit (S, D, 2) per-view/plane pixel shifts that
    REPLACE the camera-derived :func:`translation_shifts` on the
    translation fast path (requires shift_pad > 0) — the cascade hook
    (models/cascade_sweep.py): band-pre-warped sources sweep residual
    shifts that no camera geometry describes. ``cameras`` is unused then.
    """
    dtype = images.dtype if jnp.issubdtype(images.dtype, jnp.floating) else jnp.float32
    images = images.astype(dtype)
    ref = images[ref_index]
    h, w = ref.shape
    if depths is None:
        depths = inverse_depth_samples(cfg.z_near, cfg.z_far, cfg.num_planes, dtype=dtype)
    if shifts is not None and shift_pad <= 0:
        raise ValueError("explicit shifts require the translation fast path (shift_pad > 0)")
    src = jnp.asarray(src_indices, dtype=jnp.int32)

    ref_census = (
        census_transform(ref, (cfg.patch, cfg.patch)) if cfg.cost == "census" else None
    )
    src_images = images[src]  # (S, H, W)

    resolved = _resolve_backend(backend)
    # "mean" averages over VALID views (kernel valid_mean=True);
    # "topk_mean" with k >= S is a plain ceiling-padded mean (False);
    # "topk_mean" with k < S streams a k-slot insertion sort in-kernel —
    # three distinct fusion semantics, all kernel-supported (the XLA
    # chain remains the oracle for "min" and the sad/zncc costs)
    mean_fusion = cfg.fusion == "mean" or (
        cfg.fusion == "topk_mean" and cfg.topk >= len(src_indices)
    )
    kernel_topk = (
        int(cfg.topk)
        if cfg.fusion == "topk_mean" and 1 <= cfg.topk < len(src_indices)
        else None
    )
    if (
        shift_pad > 0
        and cfg.cost == "census"
        and (mean_fusion or kernel_topk is not None)
        and resolved in ("pallas", "pallas_interpret")
    ):
        # Fused MXU one-hot-warp kernel: sources stay VMEM-resident across
        # the plane grid, warp + census + hamming + fusion in one pass
        # (~2x the XLA chain; see ops/sweep_pallas.py for the traffic
        # analysis and the deliberate patch//2 border divergence).
        from stereovisionarray_tpu.ops.sweep_pallas import (
            plane_sweep_census_pallas,
        )

        if shifts is None:
            shifts = translation_shifts(cameras, ref_index, src, depths)
        fused, nviews = plane_sweep_census_pallas(
            ref,
            src_images,
            jnp.swapaxes(shifts, 0, 1),  # (D, S, 2)
            patch=cfg.patch,
            shift_pad=shift_pad,
            valid_mean=cfg.fusion == "mean",
            interpret=resolved == "pallas_interpret",
            axis_flags=axis_flags,
            sources_8bit=cfg.sources_8bit,
            topk=kernel_topk,
        )
        vol = jnp.moveaxis(fused, 0, -1)  # (H, W, D)
        nv = jnp.moveaxis(nviews, 0, -1)
        return vol.astype(dtype), nv, depths

    if shift_pad > 0:
        pad = shift_pad + 1
        padded = jnp.pad(src_images, ((0, 0), (pad, pad), (pad, pad)))
        # (S, D, 2): (su, sv) per view/plane, in the exact closed form
        if shifts is None:
            shifts = translation_shifts(cameras, ref_index, src, depths)
        v_iota = jax.lax.broadcasted_iota(dtype, (h, w), 0)
        u_iota = jax.lax.broadcasted_iota(dtype, (h, w), 1)

        def per_plane(shift_d):
            def per_view(img_p, s_uv):
                warped = _shift_warp(img_p, s_uv[0], s_uv[1], h, w, pad)
                ok = (
                    (u_iota + s_uv[0] >= 0.0)
                    & (u_iota + s_uv[0] <= w - 1.0)
                    & (v_iota + s_uv[1] >= 0.0)
                    & (v_iota + s_uv[1] <= h - 1.0)
                )
                return warped, ok

            warped, ok = jax.vmap(per_view)(padded, shift_d)  # (S, H, W)
            costs, ceiling = _view_cost(ref, ref_census, warped, ok, cfg, dtype)
            fused = _fuse_views(costs, ok, ceiling, cfg)
            return fused, jnp.sum(ok, axis=0).astype(jnp.int32)

        fused, nviews = _chunked_plane_map(
            per_plane, jnp.swapaxes(shifts, 0, 1), cfg.plane_chunk
        )
    else:
        H_all = cameras.fronto_plane_homography(
            ref_index, src, depths
        )  # (S, D, 3, 3)

        def per_plane(Hs_d):
            # Hs_d: (S, 3, 3) homographies of every source view for this plane
            def per_view(img, Hm):
                warped, ok = homography_warp(img, Hm)
                return warped, ok

            warped, ok = jax.vmap(per_view)(src_images, Hs_d)  # (S, H, W)
            costs, ceiling = _view_cost(ref, ref_census, warped, ok, cfg, dtype)
            fused = _fuse_views(costs, ok, ceiling, cfg)
            return fused, jnp.sum(ok, axis=0).astype(jnp.int32)

        # chunked map over planes bounds peak memory at one (chunk, S, H, W)
        # warp stack while amortizing kernel dispatch across the chunk
        fused, nviews = _chunked_plane_map(
            per_plane, jnp.swapaxes(H_all, 0, 1), cfg.plane_chunk
        )  # (D, H, W)
    vol = jnp.moveaxis(fused, 0, -1)  # (H, W, D)
    nv = jnp.moveaxis(nviews, 0, -1)
    return vol, nv, depths


from stereovisionarray_tpu.backend import resolve_backend as _resolve_backend


@functools.partial(
    jax.jit,
    static_argnames=(
        "ref_index", "src_indices", "cfg", "sgm_cfg", "min_views", "backend",
        "shift_pad", "axis_flags",
    ),
)
def plane_sweep_depth(
    images: jnp.ndarray,
    cameras: CameraArray,
    ref_index: int,
    src_indices: tuple,
    cfg: PlaneSweepConfig = PlaneSweepConfig(),
    sgm_cfg: Optional[SGMConfig] = SGMConfig(lr_max_diff=0.0),
    min_views: int = 2,
    mask: Optional[jnp.ndarray] = None,
    backend: str = "auto",
    shift_pad: int = 0,
    axis_flags: Optional[tuple] = None,
) -> PlaneSweepOutput:
    """Full N-view fused depth for the reference view.

    The winning plane is refined by parabola interpolation in *inverse-depth*
    space (planes are uniform in 1/z, so the parabola is well-conditioned).
    Pixels seen by fewer than ``min_views`` sources at their winning plane
    are invalidated (they have no photoconsistency evidence).

    backend: "auto" | "xla" | "pallas" | "pallas_interpret" — the Pallas
    path runs SGM aggregation + WTA/subpixel through the (H, D, W) fused
    kernels (ops/sgm_pallas.py, ops/extract_pallas.py); smoothness over
    the plane index is the same recurrence as disparity smoothness.
    """
    vol, nv, depths = plane_sweep_volume(
        images, cameras, ref_index, src_indices, cfg, shift_pad=shift_pad,
        backend=backend, axis_flags=axis_flags,
    )
    k, cost, conf, k_int = _volume_to_maps(
        vol, images[ref_index], cfg, sgm_cfg, backend
    )

    inv_near = 1.0 / cfg.z_near
    inv_far = 1.0 / cfg.z_far
    step = (inv_far - inv_near) / max(cfg.num_planes - 1, 1)
    inv_depth = inv_near + k * step
    depth = 1.0 / jnp.maximum(inv_depth, 1e-9)

    # one-hot select, NOT take_along_axis: a per-pixel gather serializes
    # on TPU (measured ~1 ms/lookup at this shape in ops/refine.py)
    d_sel = jax.lax.broadcasted_iota(jnp.int32, nv.shape, nv.ndim - 1)
    views_at_win = jnp.sum(
        jnp.where(d_sel == k_int[..., None], nv, 0), axis=-1
    )
    valid = views_at_win >= min_views
    if mask is not None:
        valid = valid & mask
    depth = jnp.where(valid, depth, 0.0)
    return PlaneSweepOutput(
        depth=depth, plane=k, cost=cost, valid=valid, num_views=views_at_win,
        confidence=jnp.where(valid, conf, 0.0),
    )


def _volume_to_maps(
    vol: jnp.ndarray,
    ref_image: jnp.ndarray,
    cfg: PlaneSweepConfig,
    sgm_cfg: Optional[SGMConfig],
    backend: str,
) -> tuple:
    """(H, W, D) fused cost volume -> per-pixel winner maps.

    SGM aggregation over the plane axis + WTA + subpixel parabola +
    PKRN confidence, on the requested backend. Returns
    ``(k, cost, conf, k_int)`` with ``k`` the fractional winning plane
    index. Shared by :func:`plane_sweep_depth` and the cascade fine pass
    (models/cascade_sweep.py), which decode plane indices differently.
    """
    resolved = _resolve_backend(backend)
    if resolved in ("pallas", "pallas_interpret"):
        from stereovisionarray_tpu.ops.cost_volume import COST_SCALE
        from stereovisionarray_tpu.ops.extract_pallas import extract_maps_hdw

        interpret = resolved == "pallas_interpret"
        vol_hdw = jnp.moveaxis(vol, -1, 1)
        # int16 fixed-point aggregation (the two-view fast-path trick,
        # models/two_view.py) HALVES the SGM volume traffic, but the scale
        # must match the cost mode's dynamic range: census fused costs span
        # [0, patch^2-1] (scale 4 ~= 0.5% steps), zncc costs live in [0, 2]
        # and need a far finer step. Quantization is skipped entirely (the
        # Pallas kernels run float32) whenever a nonzero SGM penalty would
        # round to zero or the 8-path aggregate could overflow int16.
        # The XLA oracle path below stays float for test comparison.
        scale = 512 if cfg.cost == "zncc" else COST_SCALE
        ceiling = {
            "census": cfg.patch * cfg.patch - 1, "sad": 255.0, "zncc": 2.0,
        }[cfg.cost]
        pens = (
            (sgm_cfg.p1, sgm_cfg.p2, sgm_cfg.p2_min) if sgm_cfg is not None else ()
        )
        quantize = all(round(p * scale) >= 1 for p in pens if p > 0) and (
            8 * (ceiling + max(pens, default=0.0)) * scale < 30000
        )
        if quantize:
            pen = lambda v: round(v * scale)
            # int8 when the scaled ceiling fits: the raw volume read by
            # every sweep halves again (the kernels load i8, compute i32,
            # sum in int16 — BIT-IDENTICAL to storing the same values in
            # int16, tested in test_sgm_pallas/test_parallel and on device
            # by check_tpu_parity). Census at patch 5 is 24 * 4 = 96 <= 127.
            vol_dtype = (
                jnp.int8 if round(ceiling * scale) <= 127 else jnp.int16
            )
            vol_hdw = jnp.round(vol_hdw * scale).astype(vol_dtype)
        else:
            scale = 1
            pen = lambda v: v
            vol_hdw = vol_hdw.astype(jnp.float32)
        if sgm_cfg is not None:
            # fused final sweep + extraction (models/two_view.py fast path):
            # the aggregated plane volume never reaches HBM — bit-identical
            # to sgm_aggregate_pallas_hdw + extract_maps_hdw for int16
            from stereovisionarray_tpu.ops.sgm_pallas import (
                sgm_extract_fused_wdh,
            )

            maps = sgm_extract_fused_wdh(
                vol_hdw,
                None,
                p1=pen(sgm_cfg.p1),
                p2=pen(sgm_cfg.p2),
                num_paths=sgm_cfg.num_paths,
                image=ref_image,
                adaptive_p2=sgm_cfg.adaptive_p2,
                p2_min=pen(sgm_cfg.p2_min),
                subpixel=True,
                uniqueness=0.0,
                lr_max_diff=0.0,
                interpret=interpret,
            )
        else:
            maps = extract_maps_hdw(vol_hdw, subpixel=True, interpret=interpret)
        k = maps.disparity  # fractional winning plane index
        cost = maps.cost / scale  # back to unscaled cost units
        k_int = jnp.clip(jnp.round(k).astype(jnp.int32), 0, vol.shape[-1] - 1)
        from stereovisionarray_tpu.ops.confidence import pkrn_confidence

        conf = pkrn_confidence(maps.cost, maps.second)  # scale-invariant
    else:
        if sgm_cfg is not None:
            vol = sgm_aggregate(
                vol,
                p1=sgm_cfg.p1,
                p2=sgm_cfg.p2,
                num_paths=sgm_cfg.num_paths,
                image=ref_image,
                adaptive_p2=sgm_cfg.adaptive_p2,
                p2_min=sgm_cfg.p2_min,
            )
        k_int, cost = winner_take_all(vol)
        k = subpixel_refine(vol, k_int)  # fractional plane index
        from stereovisionarray_tpu.ops.confidence import confidence_from_volume

        conf = confidence_from_volume(vol, k_int)
    return k, cost, conf, k_int

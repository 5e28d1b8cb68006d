"""Mesh-sharded multi-view depth fusion: the reference-view axis of
``models.fusion.fuse_depth_maps`` is embarrassingly parallel (each view's
consistency vote reads all OTHER views' depth maps but writes only its
own), so it shards over the data axis with zero communication — the P1
pattern (SURVEY.md §2.2) applied to the fusion subsystem.

Depth maps are replicated (they are the read-side of every vote); each
shard runs the same two consistency sweeps over its slice of reference
views. Padding views (when N does not divide the axis) carry valid=False
depth maps, which can never vote (the qualified-ownership dedup sweep
already treats non-qualified views as silent) and are dropped on return.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereovisionarray_tpu.geometry.camera import CameraArray
from stereovisionarray_tpu.models.fusion import FusionResult
from stereovisionarray_tpu.parallel.mesh import AXIS_DATA

__all__ = ["sharded_fuse_depth_maps"]


def sharded_fuse_depth_maps(
    cameras: CameraArray,
    depths: jnp.ndarray,
    mesh: Mesh,
    valid: Optional[jnp.ndarray] = None,
    *,
    rel_thresh: float = 0.01,
    min_support: int = 3,
    min_depth: float = 1e-6,
    dedup: bool = True,
    average: bool = True,
) -> FusionResult:
    """``fuse_depth_maps`` with the reference-view axis sharded over the
    mesh's data axis. Bit-identical to the single-device call (each view's
    sweeps see the identical replicated inputs; only the outer vmap-like
    axis is split).

    N is padded up to a multiple of the data-axis size with never-voting
    dummy views; outputs are cropped back to N."""
    n_data = mesh.shape[AXIS_DATA]
    n, h, w = depths.shape
    pad = (-n) % n_data
    base_valid = depths > min_depth
    if valid is not None:
        base_valid = base_valid & valid
    if pad:
        depths_p = jnp.concatenate(
            [depths, jnp.zeros((pad, h, w), depths.dtype)], axis=0
        )
        valid_p = jnp.concatenate(
            [base_valid, jnp.zeros((pad, h, w), bool)], axis=0
        )
        cam_pad = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], axis=0
            ),
            cameras,
        )
    else:
        depths_p, valid_p, cam_pad = depths, base_valid, cameras

    def local(ref_slice, ref_valid, ref_cams, all_depths, all_valid, all_cams):
        # per-shard: fuse the LOCAL reference views against the full
        # replicated view set. fuse_depth_maps votes per reference view
        # independently, so running it with a restricted reference axis is
        # exactly the slice of the full result — implemented by calling the
        # inner machinery with (local refs, all sources).
        return _fuse_refs_against_all(
            ref_cams, ref_slice, ref_valid, all_cams, all_depths, all_valid,
            n_real=n, rel_thresh=rel_thresh, min_support=min_support,
            min_depth=min_depth, dedup=dedup, average=average,
        )

    spec_ref = P(AXIS_DATA, None, None)
    rep3 = P(None, None, None)
    sharded = jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_ref, spec_ref, P(AXIS_DATA), rep3, rep3, P(None)),
        out_specs=FusionResult(
            points=P(AXIS_DATA, None, None, None),
            valid=spec_ref,
            depth=spec_ref,
            support=spec_ref,
            confidence=spec_ref,
        ),
        check_vma=False,
    ))
    rep_sh = NamedSharding(mesh, rep3)
    out = sharded(
        jax.device_put(depths_p, NamedSharding(mesh, spec_ref)),
        jax.device_put(valid_p, NamedSharding(mesh, spec_ref)),
        jax.device_put(cam_pad, NamedSharding(mesh, P(AXIS_DATA))),
        jax.device_put(depths_p, rep_sh),
        jax.device_put(valid_p, rep_sh),
        jax.device_put(cam_pad, NamedSharding(mesh, P(None))),
    )
    if pad:
        out = jax.tree_util.tree_map(lambda x: x[:n], out)
    return out


def _fuse_refs_against_all(
    ref_cams: CameraArray,
    ref_depths: jnp.ndarray,
    ref_valid: jnp.ndarray,
    all_cams: CameraArray,
    all_depths: jnp.ndarray,
    all_valid: jnp.ndarray,
    *,
    n_real: int,
    rel_thresh: float,
    min_support: int,
    min_depth: float,
    dedup: bool,
    average: bool,
) -> FusionResult:
    """fuse_depth_maps generalized to (local reference views) x (global
    source views). Mirrors models.fusion.fuse_depth_maps exactly; the
    single-device function is the m == n special case. Ownership indices
    (dedup) are GLOBAL source-view ids, so first-view-wins semantics match
    the unsharded result bit-for-bit."""
    from stereovisionarray_tpu.models.fusion import _pixel_grid
    from stereovisionarray_tpu.ops.warp import bilinear_sample
    from jax import lax

    m, h, w = ref_depths.shape
    n = all_depths.shape[0]
    p = h * w
    f32 = jnp.float32
    rflat = jnp.where(ref_valid, ref_depths.astype(f32), 0.0).reshape(m, p)
    rvalid = ref_valid.reshape(m, p)
    aflat = jnp.where(all_valid, all_depths.astype(f32), 0.0)

    uv = _pixel_grid(h, w)
    pts = ref_cams.backproject(jnp.broadcast_to(uv, (m, p, 2)), rflat)
    # global id of each LOCAL reference view: its position in the full set
    # (cameras match by center equality is fragile — use the data-axis
    # shard offset instead)
    shard = lax.axis_index(AXIS_DATA)
    gid = shard * m + jnp.arange(m, dtype=jnp.int32)[:, None]  # (m, 1)

    def sweep(validf):
        def one_view(carry, j):
            support, depth_sum, first_j = carry
            cam_j = all_cams[j]
            uv_ij, z_ij = cam_j.project(pts)
            dj, inb = bilinear_sample(aflat[j], uv_ij, fill=0.0)
            vj, _ = bilinear_sample(validf[j], uv_ij, fill=0.0)
            agree = (
                inb
                & (z_ij > min_depth)
                & (dj > min_depth)
                & (vj > 0.99)
                & (jnp.abs(dj - z_ij) <= rel_thresh * z_ij)
            )
            other = agree & (gid != j)
            pj = cam_j.backproject(uv_ij, dj)
            z_back = ref_cams.world_to_cam(pj)[..., 2]
            support = support + other.astype(jnp.int32)
            depth_sum = depth_sum + jnp.where(other, z_back, 0.0)
            first_j = jnp.minimum(first_j, jnp.where(other, j, n))
            return (support, depth_sum, first_j), None

        init = (
            jnp.zeros((m, p), jnp.int32),
            jnp.zeros((m, p), f32),
            jnp.full((m, p), n, jnp.int32),
        )
        (support, depth_sum, first_j), _ = lax.scan(
            one_view, init, jnp.arange(n, dtype=jnp.int32)
        )
        return support, depth_sum, first_j

    support, depth_sum, _ = sweep(all_valid.astype(f32))
    support_total = support + 1
    keep = rvalid & (support_total >= min_support)
    if dedup:
        # qualified masks must be GLOBAL: gather each shard's local keep
        # into the full (n, h, w) qualified map (one all_gather)
        keep_local = keep.reshape(m, h, w)
        qualified = lax.all_gather(
            keep_local.astype(f32), AXIS_DATA, axis=0, tiled=True
        )[:n] if n > m else keep_local.astype(f32)
        _, _, first_j = sweep(qualified)
        keep = keep & (first_j >= gid)
    if average:
        fused = (rflat + depth_sum) / support_total.astype(f32)
    else:
        fused = rflat
    fused = jnp.where(keep, fused, 0.0)
    pts_out = ref_cams.backproject(jnp.broadcast_to(uv, (m, p, 2)), fused)
    conf = support_total.astype(f32) / jnp.float32(n_real)
    return FusionResult(
        points=pts_out.reshape(m, h, w, 3),
        valid=keep.reshape(m, h, w),
        depth=fused.reshape(m, h, w),
        support=support_total.reshape(m, h, w),
        confidence=jnp.where(keep, conf, 0.0).reshape(m, h, w),
    )

"""Sharded two-view SGM pipeline over a (data, tile, disp) mesh.

The multi-chip realization of BASELINE.json config 5's stereo half
("disparity-sharded cost volume"), replacing the reference's single-threaded
pixel loop (``/root/reference/src/CameraStereoVision.cpp:49-95``) with:

  data axis — batch of stereo pairs, embarrassingly parallel;
  tile axis — image rows, coupled only through ``halo`` boundary rows
      exchanged once via ``ppermute`` (vertical/diagonal SGM paths are
      truncated at the halo depth; the min-normalized SGM recurrence forgets
      its carry geometrically, so a few dozen rows of halo reproduce the
      unsharded result to float tolerance — verified by
      tests/test_parallel.py);
  disp axis — each shard builds its own D-chunk of the cost volume
      (``d_offset``), all-gathers chunks along D, then aggregates a disjoint
      *subset of SGM paths* (path parallelism — total = sum over 8
      independent paths) combined with one ``psum``.

All collectives (ppermute / all_gather / psum) are compiler-scheduled over
ICI — no hand-written communication backend (SURVEY.md §2.2 P6).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stereovisionarray_tpu.config import CostConfig, SGMConfig
from stereovisionarray_tpu.models.two_view import TwoViewOutput, disparity_to_depth
from stereovisionarray_tpu.ops.cost_volume import (
    fused_cost_volume,
    right_from_left_volume,
)
from stereovisionarray_tpu.ops.sgm import ALL_PATH_IDS, sgm_aggregate_paths
from stereovisionarray_tpu.ops.wta import disparity_from_volume, winner_take_all
from stereovisionarray_tpu.parallel.halo import (
    crop_halo,
    exchange_halo,
    mask_out_of_image,
)
from stereovisionarray_tpu.parallel.mesh import AXIS_DATA, AXIS_DISP, AXIS_TILE

# Uniform cost assigned to out-of-image halo rows: any constant works (the
# SGM recurrence renormalizes a uniform carry to a fresh start); zero keeps
# the volume's dynamic range.
_OOB_COST = 0.0


def _split_paths(num_paths: int, n_disp: int) -> list:
    """Disjoint path-id chunks, one per disp shard."""
    ids = ALL_PATH_IDS[:num_paths]
    if num_paths % n_disp != 0:
        raise ValueError(
            f"disp mesh axis ({n_disp}) must divide num_paths ({num_paths}) "
            "for path-parallel SGM"
        )
    k = num_paths // n_disp
    return [tuple(ids[i * k : (i + 1) * k]) for i in range(n_disp)]


def sharded_two_view_disparity(
    left: jnp.ndarray,
    right: jnp.ndarray,
    mesh: Mesh,
    cost_cfg: CostConfig = CostConfig(),
    sgm_cfg: SGMConfig = SGMConfig(),
    halo: int = 48,
    mask: Optional[jnp.ndarray] = None,
    baseline: Optional[float] = None,
    focal_px: Optional[float] = None,
) -> TwoViewOutput:
    """Batched, mesh-sharded version of ``models.two_view.two_view_disparity``.

    left/right: (B, H, W) with B divisible by the data axis and H by the
    tile axis; the D axis (cost_cfg.num_disparities) must be divisible by
    the disp axis, and the disp axis must divide sgm_cfg.num_paths.

    Returns a TwoViewOutput of (B, H, W) maps, sharded (data, tile).
    """
    B, H, W = left.shape
    n_data = mesh.shape[AXIS_DATA]
    n_tile = mesh.shape[AXIS_TILE]
    n_disp = mesh.shape[AXIS_DISP]
    D = cost_cfg.num_disparities
    if B % n_data or H % n_tile or D % n_disp:
        raise ValueError(
            f"shapes (B={B}, H={H}, D={D}) not divisible by mesh "
            f"({n_data}, {n_tile}, {n_disp})"
        )
    d_local = D // n_disp
    path_chunks = _split_paths(sgm_cfg.num_paths, n_disp)
    dtype = jnp.dtype(cost_cfg.dtype)
    if jnp.issubdtype(dtype, jnp.integer):
        # the sharded path runs the XLA-scan SGM, which is float-only (the
        # int16 fixed-point mode is a single-chip Pallas optimization)
        dtype = jnp.dtype(jnp.float32)
    use_halo = min(halo, H // n_tile) if n_tile > 1 else 0

    def _one_pair(l_ext: jnp.ndarray, r_ext: jnp.ndarray, disp_idx) -> tuple:
        """Pipeline on one halo-extended (h_ext, W) pair; disp_idx traced."""
        vol = fused_cost_volume(
            l_ext,
            r_ext,
            d_local,
            census_window=cost_cfg.census_window,
            bt_weight=cost_cfg.bt_weight,
            bt_clip=cost_cfg.bt_clip,
            dtype=dtype,
            d_offset=disp_idx * d_local,
        )
        if n_disp > 1:
            vol = lax.all_gather(vol, AXIS_DISP, axis=-1, tiled=True)
        vol = mask_out_of_image(vol, use_halo, AXIS_TILE, axis=0, fill_value=_OOB_COST)

        sgm_kwargs = dict(
            p1=sgm_cfg.p1,
            p2=sgm_cfg.p2,
            image=l_ext,
            adaptive_p2=sgm_cfg.adaptive_p2,
            p2_min=sgm_cfg.p2_min,
        )
        if n_disp == 1:
            agg = sgm_aggregate_paths(vol, path_ids=path_chunks[0], **sgm_kwargs)
        else:
            branches = [
                functools.partial(sgm_aggregate_paths, path_ids=chunk, **sgm_kwargs)
                for chunk in path_chunks
            ]
            agg = lax.psum(lax.switch(disp_idx, branches, vol), AXIS_DISP)

        vol_right = right_from_left_volume(agg) if sgm_cfg.lr_max_diff > 0 else None
        res = disparity_from_volume(
            agg,
            vol_right=vol_right,
            subpixel=sgm_cfg.subpixel,
            uniqueness=sgm_cfg.uniqueness,
            lr_max_diff=sgm_cfg.lr_max_diff,
        )
        return res.disparity, res.valid, res.cost

    def _local(l: jnp.ndarray, r: jnp.ndarray) -> tuple:
        # l, r: (b_local, h_local, W)
        disp_idx = lax.axis_index(AXIS_DISP)
        if use_halo > 0:
            l = exchange_halo(l, use_halo, AXIS_TILE, axis=1, edge_mode="edge")
            r = exchange_halo(r, use_halo, AXIS_TILE, axis=1, edge_mode="edge")
        d, v, c = jax.vmap(lambda a, b: _one_pair(a, b, disp_idx))(l, r)
        if use_halo > 0:
            d = crop_halo(d, use_halo, axis=1)
            v = crop_halo(v, use_halo, axis=1)
            c = crop_halo(c, use_halo, axis=1)
        return d, v, c

    spec_in = P(AXIS_DATA, AXIS_TILE, None)
    sharded = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(spec_in, spec_in),
        out_specs=(spec_in, spec_in, spec_in),
        check_vma=False,
    )
    left = jax.device_put(left.astype(dtype), NamedSharding(mesh, spec_in))
    right = jax.device_put(right.astype(dtype), NamedSharding(mesh, spec_in))
    disp, valid, cost = sharded(left, right)
    if mask is not None:
        valid = valid & mask
        disp = jnp.where(valid, disp, -1.0)
    depth = None
    if baseline is not None and focal_px is not None:
        depth = jnp.where(valid, disparity_to_depth(disp, baseline, focal_px), 0.0)
    return TwoViewOutput(disparity=disp, valid=valid, cost=cost, depth=depth)


def sharded_wta(
    vol: jnp.ndarray, mesh: Mesh
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Disparity-sharded winner-take-all — the min-reduce collective pattern
    (SURVEY.md §5 "long-context" analogue) usable standalone when no SGM
    aggregation is wanted (the reference's raw-WTA mode,
    ``/root/reference/src/CameraStereoVision.cpp:85``).

    vol: (H, W, D) sharded P(tile, None, disp). Each shard takes the argmin
    of its D-chunk; per-shard (min, argmin) pairs are all-gathered (n_disp
    scalars per pixel — tiny vs the volume) and reduced. Tie-break matches
    the unsharded argmin (lowest d wins).

    Returns (disparity int32 (H, W), cost (H, W)) sharded P(tile, None).
    """
    n_disp = mesh.shape[AXIS_DISP]
    d_local = vol.shape[-1] // n_disp

    def _local(v):
        d0 = lax.axis_index(AXIS_DISP) * d_local
        d_loc, c_loc = winner_take_all(v)
        d_glob = d_loc + d0
        cs = lax.all_gather(c_loc, AXIS_DISP)  # (n_disp, h, w) in d order
        ds = lax.all_gather(d_glob, AXIS_DISP)
        k = jnp.argmin(cs, axis=0)
        best_c = jnp.take_along_axis(cs, k[None], axis=0)[0]
        best_d = jnp.take_along_axis(ds, k[None], axis=0)[0]
        return best_d, best_c

    return jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=P(AXIS_TILE, None, AXIS_DISP),
        out_specs=(P(AXIS_TILE, None), P(AXIS_TILE, None)),
        check_vma=False,
    )(vol)

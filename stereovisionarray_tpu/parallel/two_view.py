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

Backends: ``backend="pallas"`` (default on TPU) runs the SAME int16 Pallas
kernels as the single-chip fast path inside shard_map — (H, D, W) layout,
fused sweep SGM, one-pass extraction — with the disp axis splitting the 4
sweep directions (down/up/lr/rl path groups) instead of individual path ids.
``backend="xla"`` is the float32 scan path (any mesh shape);
``backend="pallas_interpret"`` runs the kernels in interpreter mode for CPU
tests.
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
from stereovisionarray_tpu.ops.sgm import (
    ALL_PATH_IDS,
    _edge_p2,
    _scan_along_axis0,
    scan_with_carry,
    sgm_aggregate_paths,
)
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


# Pallas path parallelism works at sweep granularity (one fused kernel per
# direction group): disp-shard i runs _SWEEP_CHUNKS[n_disp][i]. The 2-way
# split pairs a vertical group (3 paths) with a horizontal one (1 path) so
# both shards do comparable work.
_SWEEP_CHUNKS = {
    1: [("down", "up", "lr", "rl")],
    2: [("down", "lr"), ("up", "rl")],
    4: [("down",), ("up",), ("lr",), ("rl",)],
}


from stereovisionarray_tpu.backend import (
    resolve_backend as _resolve_parallel_backend,
)


from stereovisionarray_tpu.ops.sgm import _BIG as _BIGF  # fresh-start carry
# sentinel — the relay's bit-for-bit exactness claim REQUIRES the same
# constant as the single-device scans, so import it rather than re-declare

# path id -> (reverse, diag_shift) for the vertical/diagonal paths that cross
# tile-shard boundaries (ids per ops.sgm.ALL_PATH_IDS)
_VERTICAL_PATHS = {0: (False, 0), 1: (True, 0), 4: (False, +1), 5: (False, -1),
                   6: (True, +1), 7: (True, -1)}


def _relay_scan(vol, p2_row, p1, diag_shift, reverse, n_tile):
    """EXACT vertical SGM path over tile-sharded rows: a K-round sequential
    relay of the (W, D) wavefront via ppermute (SURVEY.md §7 'hard parts';
    VERDICT r1 item 4). Round k computes shard k's local scan seeded with
    shard k-1's final front; only the round matching this shard's position in
    the scan order is kept. Work is K x local-rows per shard (the vertical
    paths don't scale with tile sharding — the price of bit-exactness; the
    horizontal paths, cost build and extraction still do)."""
    v = jnp.flip(vol, 0) if reverse else vol
    p = jnp.flip(p2_row, 0) if reverse else p2_row
    my = lax.axis_index(AXIS_TILE)
    pos = (n_tile - 1 - my) if reverse else my  # my position in scan order
    if reverse:
        src_dst = [(i, i - 1) for i in range(1, n_tile)]
    else:
        src_dst = [(i, i + 1) for i in range(n_tile - 1)]
    big = jnp.full(v.shape[1:], jnp.asarray(_BIGF, v.dtype))

    def body(k, state):
        incoming, out = state
        rows, final = scan_with_carry(v, p1, p, diag_shift, init_carry=incoming)
        out = jnp.where(pos == k, rows, out)
        nxt = lax.ppermute(final, AXIS_TILE, src_dst)
        return nxt, out

    _, out = lax.fori_loop(0, n_tile, body, (big, jnp.zeros_like(v)))
    return jnp.flip(out, 0) if reverse else out


def _relay_sweep_pallas(vol, p2_map, p1, reverse, n_tile, interpret):
    """EXACT tile-sharded STACKED vertical sweep (Pallas backend twin of
    :func:`_relay_scan`): round k seeds the 3-path-group sweep kernel with
    shard k-1's outgoing (3D, W) front (``_sweep_hdw_stacked(init_carry=,
    emit_final=True)``), relayed via ppermute. A BIG incoming front
    reproduces fresh-start semantics exactly (the recurrence normalizes a
    uniform carry to cost + 0), so round 0's first shard matches the
    unsharded kernel bit for bit — verified in tests/test_parallel.py."""
    from stereovisionarray_tpu.ops.sgm_pallas import (
        _big_for,
        _carry_dtype,
        _sum_dtype,
        _sweep_hdw_stacked,
    )

    s, d, n = vol.shape
    my = lax.axis_index(AXIS_TILE)
    pos = (n_tile - 1 - my) if reverse else my
    if reverse:
        src_dst = [(i, i - 1) for i in range(1, n_tile)]
    else:
        src_dst = [(i, i + 1) for i in range(n_tile - 1)]
    cdt = _carry_dtype(vol.dtype)
    big = jnp.full((3 * d, n), jnp.asarray(_big_for(cdt), cdt))

    def body(k, state):
        incoming, out = state
        rows, final = _sweep_hdw_stacked(
            vol, p2_map, p1, reverse, interpret,
            init_carry=incoming, emit_final=True,
        )
        out = jnp.where(pos == k, rows, out)
        nxt = lax.ppermute(final, AXIS_TILE, src_dst)
        return nxt, out

    out0 = jnp.zeros(vol.shape, _sum_dtype(vol.dtype))
    _, out = lax.fori_loop(0, n_tile, body, (big, out0))
    return out


def _sgm_aggregate_exact(vol, p2_y, p2_x, p1, path_ids, n_tile):
    """Path-subset SGM aggregation on LOCAL rows (h_local, W, D) with exact
    cross-shard carries: vertical/diagonal paths relay their wavefront
    (:func:`_relay_scan`); horizontal paths scan complete local rows. Path
    order matches ``ops.sgm.sgm_aggregate_paths`` so the f32 accumulation
    order (and hence the bits) match the unsharded aggregate."""
    p1 = jnp.asarray(p1, vol.dtype)
    total = jnp.zeros_like(vol)
    for pid in path_ids:
        if pid in _VERTICAL_PATHS:
            reverse, diag = _VERTICAL_PATHS[pid]
            total += _relay_scan(vol, p2_y, p1, diag, reverse, n_tile)
        elif pid == 2:  # left -> right: complete rows, no shard coupling
            vol_t = jnp.swapaxes(vol, 0, 1)
            total += jnp.swapaxes(
                _scan_along_axis0(vol_t, p1, None, 0, p2_row=jnp.swapaxes(p2_x, 0, 1)),
                0, 1,
            )
        elif pid == 3:  # right -> left
            vol_t = jnp.flip(jnp.swapaxes(vol, 0, 1), 0)
            p2_t = jnp.flip(jnp.swapaxes(p2_x, 0, 1), 0)
            total += jnp.swapaxes(
                jnp.flip(_scan_along_axis0(vol_t, p1, None, 0, p2_row=p2_t), 0), 0, 1
            )
        else:
            raise ValueError(f"unknown SGM path id {pid}")
    return total


@functools.lru_cache(maxsize=64)
def _two_view_program(
    mesh: Mesh,
    cost_cfg: CostConfig,
    sgm_cfg: SGMConfig,
    halo: int,
    resolved: str,
    tile_mode: str,
    B: int,
    H: int,
    W: int,
):
    """Build (and cache) the jitted shard_map program for one
    (mesh, configs, shapes) combination.

    Rebuilding the shard_map closure per call would RE-TRACE AND RE-COMPILE
    on every invocation (a fresh Python callable defeats jax's jit cache) —
    measured minutes per call on the CPU mesh. The cache key is all static
    configuration; the returned program takes already-sharded (left, right)
    and returns (disparity, valid, cost)."""
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
    use_pallas = resolved in ("pallas", "pallas_interpret")
    interpret = resolved == "pallas_interpret"
    exact_tiles = tile_mode == "exact" and n_tile > 1
    if exact_tiles and use_pallas and sgm_cfg.num_paths != 8:
        # the Pallas relay seeds the STACKED (3-path-group) vertical sweep
        # kernel; the 4-path variant keeps separate scratch carries the
        # relay does not thread. The XLA backend relays any path set.
        raise ValueError(
            "tile_mode='exact' on the pallas backend supports num_paths=8 "
            "only; use backend='xla' for 4-path exact tiling"
        )
    if exact_tiles and n_disp > 1:
        # path-parallel chunks contain UNEVEN numbers of vertical paths
        # (e.g. {0,1,2,3} has 2 relays, {4,5,6,7} has 4): disp shards would
        # execute different collective-permute counts inside lax.switch and
        # deadlock the mesh. Fold those devices into data/tile instead.
        raise ValueError(
            "tile_mode='exact' requires a disp axis of 1 (relay collectives "
            f"cannot sit inside uneven switch branches; got disp={n_disp})"
        )
    dtype = jnp.dtype(cost_cfg.dtype)
    integer_costs = jnp.issubdtype(dtype, jnp.integer)
    if use_pallas:
        from stereovisionarray_tpu.ops.cost_volume import cost_scale_for
        from stereovisionarray_tpu.ops.extract_pallas import extract_disparity_hdw
        from stereovisionarray_tpu.ops.sgm_pallas import sgm_aggregate_pallas_sweeps

        if n_disp not in _SWEEP_CHUNKS:
            raise ValueError(
                f"pallas backend shards SGM at sweep granularity: disp axis "
                f"must be 1, 2 or 4 (got {n_disp}); use backend='xla' for "
                f"other splits"
            )
        sweep_chunks = _SWEEP_CHUNKS[n_disp]
        pen_scale = cost_scale_for(dtype) if integer_costs else 1
    else:
        path_chunks = _split_paths(sgm_cfg.num_paths, n_disp)
        if integer_costs:
            # the XLA-scan SGM is float-only (int16 fixed-point is a Pallas
            # backend feature, single-chip and sharded alike)
            dtype = jnp.dtype(jnp.float32)
            integer_costs = False
    if exact_tiles:
        # exact mode needs only the census half-window of image rows to make
        # boundary COSTS exact (census pads edge-mode, exactly what
        # exchange_halo's edge fill reproduces at the global border); SGM
        # carries cross shards via the relay, not the halo
        use_halo = min(max(cost_cfg.census_window[0] // 2, 1), H // n_tile)
    else:
        # cap at full coverage: (n_tile-1) blocks reconstructs every row of
        # the global image on each shard (exchange_halo relays multi-hop
        # when the halo spans several blocks), making halo-mode SGM
        # bit-exact at any tile count
        use_halo = min(halo, H - H // n_tile) if n_tile > 1 else 0

    def _one_pair_exact(l_ext: jnp.ndarray, r_ext: jnp.ndarray, disp_idx) -> tuple:
        """Exact tile sharding: cost on the (small) halo-extended rows, crop
        to local rows, then carry-relay SGM + local extraction."""
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
        # n_disp == 1 here by construction — _two_view_program rejects
        # tile_mode='exact' with a disp axis (relay collectives inside
        # uneven switch branches would deadlock the mesh), so no all_gather
        vol = crop_halo(vol, use_halo, axis=0)

        if sgm_cfg.adaptive_p2:
            p2_y = crop_halo(
                _edge_p2(l_ext, 0, sgm_cfg.p2, sgm_cfg.p2_min, dtype), use_halo, axis=0
            )[..., None]
            p2_x = crop_halo(
                _edge_p2(l_ext, 1, sgm_cfg.p2, sgm_cfg.p2_min, dtype), use_halo, axis=0
            )[..., None]
        else:
            shape = (vol.shape[0], W, 1)
            p2_y = jnp.broadcast_to(jnp.asarray(sgm_cfg.p2, dtype), shape)
            p2_x = p2_y

        agg = _sgm_aggregate_exact(
            vol, p2_y, p2_x, sgm_cfg.p1, path_chunks[0], n_tile
        )

        vol_right = right_from_left_volume(agg) if sgm_cfg.lr_max_diff > 0 else None
        res = disparity_from_volume(
            agg,
            vol_right=vol_right,
            subpixel=sgm_cfg.subpixel,
            uniqueness=sgm_cfg.uniqueness,
            lr_max_diff=sgm_cfg.lr_max_diff,
            with_confidence=True,
        )
        return res.disparity, res.valid, res.cost, res.confidence

    def _one_pair_pallas_exact(l_ext, r_ext, disp_idx) -> tuple:
        """Exact tile sharding on the PRODUCTION int16/int8 Pallas kernels
        (VERDICT r2 item 8): census-halo cost build, carry-relayed stacked
        vertical sweeps (:func:`_relay_sweep_pallas`), complete-row
        horizontal sweeps, one-pass extraction. Integer path sums
        reassociate exactly, so the total — and the extracted maps — are
        BIT-IDENTICAL to the single-chip ``sgm_aggregate_pallas_hdw`` +
        ``extract_disparity_hdw`` at any tile count."""
        from stereovisionarray_tpu.ops.sgm_pallas import (
            _sum_dtype,
            _sweep_hdw,
            transpose_add_hdw,
        )

        pen = (lambda v: round(v * pen_scale)) if integer_costs else (lambda v: v)
        vol = fused_cost_volume(
            l_ext,
            r_ext,
            d_local,
            census_window=cost_cfg.census_window,
            bt_weight=cost_cfg.bt_weight,
            bt_clip=cost_cfg.bt_clip,
            dtype=dtype,
            d_offset=0,  # n_disp == 1 enforced for exact mode
            layout="hdw",
        )
        vol = crop_halo(vol, use_halo, axis=0)  # (h_local, D, W)
        h_loc = vol.shape[0]

        pdt = _sum_dtype(dtype)
        if sgm_cfg.adaptive_p2:
            # gradients of the halo-extended rows == global gradients on
            # the kept rows (the same bit-exactness argument as the XLA
            # exact mode's p2 maps)
            p2_y = crop_halo(
                _edge_p2(l_ext, 0, pen(sgm_cfg.p2), pen(sgm_cfg.p2_min), pdt),
                use_halo, axis=0,
            )
            p2_x = crop_halo(
                _edge_p2(l_ext, 1, pen(sgm_cfg.p2), pen(sgm_cfg.p2_min), pdt),
                use_halo, axis=0,
            )
        else:
            p2_y = jnp.full((h_loc, W), jnp.asarray(pen(sgm_cfg.p2), pdt))
            p2_x = p2_y

        p1 = pen(sgm_cfg.p1)
        total = _relay_sweep_pallas(vol, p2_y, p1, False, n_tile, interpret)
        total = total + _relay_sweep_pallas(vol, p2_y, p1, True, n_tile,
                                            interpret)
        # horizontal sweeps: rows are complete (W unsharded) — local kernels
        vol_t = jnp.transpose(vol, (2, 1, 0))
        p2_x_t = jnp.transpose(p2_x, (1, 0))
        horiz = _sweep_hdw(vol_t, p2_x_t, p1, False, False, interpret)
        horiz = _sweep_hdw(vol_t, p2_x_t, p1, True, False, interpret,
                           acc=horiz)
        total = transpose_add_hdw(total, horiz, interpret)

        from stereovisionarray_tpu.ops.extract_pallas import (
            extract_disparity_hdw as _extract,
        )

        res = _extract(
            total,
            subpixel=sgm_cfg.subpixel,
            uniqueness=sgm_cfg.uniqueness if sgm_cfg.uniqueness > 0 else 0.0,
            lr_max_diff=sgm_cfg.lr_max_diff if sgm_cfg.lr_max_diff > 0 else 0.0,
            interpret=interpret,
        )
        return res.disparity, res.valid, res.cost, res.confidence

    def _one_pair_pallas(l_ext, r_ext, disp_idx) -> tuple:
        """Fast path: (h_ext, D, W) int16 volume, fused sweep kernels, one-
        pass extraction — the same kernels as the single-chip pipeline."""
        pen = (lambda v: round(v * pen_scale)) if integer_costs else (lambda v: v)
        vol = fused_cost_volume(
            l_ext,
            r_ext,
            d_local,
            census_window=cost_cfg.census_window,
            bt_weight=cost_cfg.bt_weight,
            bt_clip=cost_cfg.bt_clip,
            dtype=dtype,
            d_offset=disp_idx * d_local,
            layout="hdw",
        )
        if n_disp > 1:
            vol = lax.all_gather(vol, AXIS_DISP, axis=1, tiled=True)  # D axis
        vol = mask_out_of_image(vol, use_halo, AXIS_TILE, axis=0, fill_value=_OOB_COST)

        sweep_kwargs = dict(
            p1=pen(sgm_cfg.p1),
            p2=pen(sgm_cfg.p2),
            num_paths=sgm_cfg.num_paths,
            image=l_ext,
            adaptive_p2=sgm_cfg.adaptive_p2,
            p2_min=pen(sgm_cfg.p2_min),
            interpret=interpret,
        )
        if n_disp == 1:
            # undivided disparity axis: the same fully-fused program as the
            # single-chip fast path (extraction inside the final reverse
            # horizontal sweep — the aggregated volume never touches HBM);
            # bit-identical to aggregate + extract for integer costs
            from stereovisionarray_tpu.ops.sgm_pallas import (
                sgm_extract_fused_wdh,
            )

            maps = sgm_extract_fused_wdh(
                vol,
                None,
                subpixel=sgm_cfg.subpixel,
                uniqueness=sgm_cfg.uniqueness if sgm_cfg.uniqueness > 0 else 0.0,
                lr_max_diff=sgm_cfg.lr_max_diff if sgm_cfg.lr_max_diff > 0 else 0.0,
                **sweep_kwargs,
            )
            # TwoViewOutput contract: INVALID_DISPARITY where rejected (the
            # unfused extract_disparity_hdw applied this fill internally)
            from stereovisionarray_tpu.ops.wta import INVALID_DISPARITY

            disp = jnp.where(maps.valid, maps.disparity, INVALID_DISPARITY)
            from stereovisionarray_tpu.ops.confidence import pkrn_confidence

            conf = pkrn_confidence(maps.cost, maps.second, maps.valid)
            return disp, maps.valid, maps.cost, conf

        branches = [
            functools.partial(
                sgm_aggregate_pallas_sweeps, sweeps=chunk, **sweep_kwargs
            )
            for chunk in sweep_chunks
        ]
        agg = lax.psum(lax.switch(disp_idx, branches, vol), AXIS_DISP)

        res = extract_disparity_hdw(
            agg,
            subpixel=sgm_cfg.subpixel,
            uniqueness=sgm_cfg.uniqueness if sgm_cfg.uniqueness > 0 else 0.0,
            lr_max_diff=sgm_cfg.lr_max_diff if sgm_cfg.lr_max_diff > 0 else 0.0,
            interpret=interpret,
        )
        return res.disparity, res.valid, res.cost, res.confidence

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
            with_confidence=True,
        )
        return res.disparity, res.valid, res.cost, res.confidence

    if exact_tiles and use_pallas:
        one_pair = _one_pair_pallas_exact
    elif exact_tiles:
        one_pair = _one_pair_exact
    elif use_pallas:
        one_pair = _one_pair_pallas
    else:
        one_pair = _one_pair

    def _local(l: jnp.ndarray, r: jnp.ndarray) -> tuple:
        # l, r: (b_local, h_local, W)
        disp_idx = lax.axis_index(AXIS_DISP)
        if use_halo > 0:
            l = exchange_halo(l, use_halo, AXIS_TILE, axis=1, edge_mode="edge")
            r = exchange_halo(r, use_halo, AXIS_TILE, axis=1, edge_mode="edge")
        d, v, c, cf = jax.vmap(lambda a, b: one_pair(a, b, disp_idx))(l, r)
        if use_halo > 0 and not exact_tiles:  # exact mode crops internally
            d = crop_halo(d, use_halo, axis=1)
            v = crop_halo(v, use_halo, axis=1)
            c = crop_halo(c, use_halo, axis=1)
            cf = crop_halo(cf, use_halo, axis=1)
        return d, v, c, cf

    spec_in = P(AXIS_DATA, AXIS_TILE, None)
    sharded = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(spec_in, spec_in),
        out_specs=(spec_in, spec_in, spec_in, spec_in),
        check_vma=False,
    )
    img_dtype = jnp.float32 if integer_costs else dtype
    return jax.jit(sharded), img_dtype, spec_in


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
    backend: str = "auto",
    tile_mode: str = "halo",
) -> TwoViewOutput:
    """Batched, mesh-sharded version of ``models.two_view.two_view_disparity``.

    left/right: (B, H, W) with B divisible by the data axis and H by the
    tile axis; the D axis (cost_cfg.num_disparities) must be divisible by
    the disp axis, and the disp axis must divide sgm_cfg.num_paths (xla
    backend) / be in {1, 2, 4} (pallas backend, sweep granularity).

    tile_mode: how vertical SGM paths handle the tile-shard boundary —
      "halo"  (default): truncate path history at `halo` exchanged rows; an
              approximation that scales linearly (the SGM recurrence forgets
              its carry geometrically, so a few dozen rows suffice in
              practice — see tests);
      "exact": relay the (W, D) wavefront between shards via a sequential
              ppermute chain (:func:`_relay_scan`) — bit-identical to the
              unsharded result at ANY tile count, at the cost of the
              vertical sweeps serializing across shards (xla backend only).

    The compiled program is cached per (mesh, configs, shapes) — repeat
    calls skip tracing entirely (:func:`_two_view_program`).

    Returns a TwoViewOutput of (B, H, W) maps, sharded (data, tile).
    """
    B, H, W = left.shape
    if tile_mode not in ("halo", "exact"):
        raise ValueError(f"unknown tile_mode {tile_mode!r}")
    resolved = _resolve_parallel_backend(backend)
    program, img_dtype, spec_in = _two_view_program(
        mesh, cost_cfg, sgm_cfg, int(halo), resolved, tile_mode, B, H, W
    )
    left = jax.device_put(left.astype(img_dtype), NamedSharding(mesh, spec_in))
    right = jax.device_put(right.astype(img_dtype), NamedSharding(mesh, spec_in))
    disp, valid, cost, conf = program(left, right)
    if mask is not None:
        valid = valid & mask
        disp = jnp.where(valid, disp, -1.0)
    conf = jnp.where(valid, conf, 0.0)
    depth = None
    if baseline is not None and focal_px is not None:
        depth = jnp.where(valid, disparity_to_depth(disp, baseline, focal_px), 0.0)
    return TwoViewOutput(disparity=disp, valid=valid, cost=cost, depth=depth,
                         confidence=conf)


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
        # one-hot select over the tiny shard axis — take_along_axis is a
        # serialized per-pixel gather on TPU (see ops/wta._value_at)
        sel = jax.lax.broadcasted_iota(jnp.int32, cs.shape, 0) == k[None]
        best_c = jnp.sum(jnp.where(sel, cs, 0), axis=0)
        best_d = jnp.sum(jnp.where(sel, ds, 0), axis=0)
        return best_d, best_c

    return jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=P(AXIS_TILE, None, AXIS_DISP),
        out_specs=(P(AXIS_TILE, None), P(AXIS_TILE, None)),
        check_vma=False,
    )(vol)

"""Halo exchange over a mesh axis via ``lax.ppermute``.

The spatial-tile parallelism primitive (SURVEY.md §2.2 P2): each shard of a
row-sharded image block receives ``halo`` boundary rows from both mesh
neighbours so windowed ops (census windows) and SGM path scans can cross
tile edges. Must be called *inside* ``jax.shard_map`` — it uses collective
permutes over the named axis. Halos larger than the local block relay whole
blocks multiple hops around the ring (``halo >= (n-1)*block`` gives every
shard the complete global axis — halo-mode SGM is then bit-exact at any
tile count).

Global edges (shard 0's top, last shard's bottom) receive ``edge_fill``;
SGM's recurrence is invariant to a *uniform* carry (``ops/sgm._step``
subtracts ``prev_min``), so a constant-filled halo reproduces the exact
fresh-start border semantics of the unsharded scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def exchange_halo(
    block: jnp.ndarray,
    halo: int,
    axis_name: str,
    axis: int = 0,
    edge_fill: float = 0.0,
    edge_mode: str = "fill",
) -> jnp.ndarray:
    """Pad ``block`` with ``halo`` entries from each mesh neighbour along
    ``axis`` (sharded over ``axis_name``). Returns the extended block of size
    ``block.shape[axis] + 2 * halo`` along ``axis``.

    Layout: ``[prev shard's last halo rows | block | next shard's first halo
    rows]``. At global edges the pad is ``edge_fill`` (edge_mode='fill') or a
    replicate of the boundary row (edge_mode='edge' — matches
    ``jnp.pad(mode='edge')`` used by the census transform, so windowed costs
    at global borders are bit-exact with the unsharded build).
    """
    if halo <= 0:
        return block
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    size = block.shape[axis]
    if halo > size:
        # multi-hop: the requested halo spans several neighbour blocks —
        # relay whole blocks around the ring and slice (halo == size*k is
        # the degenerate single-slice case of the same code)
        return _exchange_halo_multihop(
            block, halo, axis_name, axis, edge_fill, edge_mode, n, idx, size
        )

    top = lax.slice_in_dim(block, 0, halo, axis=axis)
    bot = lax.slice_in_dim(block, size - halo, size, axis=axis)

    # from_prev: shard i receives shard (i-1)'s bottom rows -> perm (i, i+1)
    from_prev = lax.ppermute(bot, axis_name, [(i, (i + 1) % n) for i in range(n)])
    # from_next: shard i receives shard (i+1)'s top rows -> perm (i, i-1)
    from_next = lax.ppermute(top, axis_name, [(i, (i - 1) % n) for i in range(n)])

    if edge_mode == "edge":
        first = lax.slice_in_dim(block, 0, 1, axis=axis)
        last = lax.slice_in_dim(block, size - 1, size, axis=axis)
        reps = [1] * block.ndim
        reps[axis] = halo
        fill_prev = jnp.tile(first, reps)
        fill_next = jnp.tile(last, reps)
    elif edge_mode == "fill":
        fill_prev = jnp.full_like(from_prev, edge_fill)
        fill_next = jnp.full_like(from_next, edge_fill)
    else:
        raise ValueError(f"unknown edge_mode {edge_mode!r}")
    from_prev = jnp.where(idx == 0, fill_prev, from_prev)
    from_next = jnp.where(idx == n - 1, fill_next, from_next)

    return jnp.concatenate([from_prev, block, from_next], axis=axis)


def _exchange_halo_multihop(
    block, halo, axis_name, axis, edge_fill, edge_mode, n, idx, size
):
    """halo > block-size case: ring-relay whole neighbour blocks
    ``ceil(halo / size)`` hops out on each side, slice the requested halo,
    then repair rows that fell outside the global image by their *global*
    position (the wrapped ring deliveries are garbage there).

    With ``halo >= (n - 1) * size`` every shard reconstructs the full global
    axis — which makes halo-mode SGM *bit-exact* at any tile count (the
    carry sees complete history), at all-gather cost."""
    if edge_mode not in ("edge", "fill"):
        raise ValueError(f"unknown edge_mode {edge_mode!r}")
    hops = min(-(-halo // size), max(n - 1, 0))
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    prev_stack = []  # farthest-first: [block_{i-hops}, ..., block_{i-1}]
    next_stack = []  # nearest-first:  [block_{i+1}, ..., block_{i+hops}]
    cur_p = cur_n = block
    for _ in range(hops):
        cur_p = lax.ppermute(cur_p, axis_name, fwd)  # now holds block_{i-j}
        cur_n = lax.ppermute(cur_n, axis_name, bwd)  # now holds block_{i+j}
        prev_stack.insert(0, cur_p)
        next_stack.append(cur_n)

    def _garbage(length):
        shape = list(block.shape)
        shape[axis] = length
        return jnp.full(shape, edge_fill, block.dtype)

    if hops:
        prev_all = jnp.concatenate(prev_stack, axis=axis)
        next_all = jnp.concatenate(next_stack, axis=axis)
        pa = prev_all.shape[axis]
        from_prev = (
            lax.slice_in_dim(prev_all, pa - halo, pa, axis=axis)
            if pa >= halo
            else jnp.concatenate([_garbage(halo - pa), prev_all], axis=axis)
        )
        from_next = (
            lax.slice_in_dim(next_all, 0, halo, axis=axis)
            if next_all.shape[axis] >= halo
            else jnp.concatenate(
                [next_all, _garbage(halo - next_all.shape[axis])], axis=axis
            )
        )
    else:  # n == 1: pure edge padding
        from_prev = _garbage(halo)
        from_next = _garbage(halo)

    ext = jnp.concatenate([from_prev, block, from_next], axis=axis)
    # global row of extended position e: g = idx*size - halo + e; rows with
    # g outside [0, n*size) hold ring-wrapped garbage (or raw fill)
    e = lax.broadcasted_iota(jnp.int32, (ext.shape[axis],), 0)
    g = idx * size - halo + e
    if edge_mode == "edge":
        # clamp to the nearest in-image row (both global boundary rows are
        # always within the extension by construction) — matches
        # jnp.pad(mode='edge') of the unsharded image
        e_min = jnp.maximum(0, halo - idx * size)
        e_max = jnp.minimum(
            ext.shape[axis] - 1, halo + (n - idx) * size - 1
        )
        ec = jnp.clip(e, e_min, e_max)
        return jnp.take(ext, ec, axis=axis)
    oob = (g < 0) | (g >= n * size)
    shape = [1] * ext.ndim
    shape[axis] = ext.shape[axis]
    return jnp.where(
        oob.reshape(shape), jnp.asarray(edge_fill, ext.dtype), ext
    )


def crop_halo(block: jnp.ndarray, halo: int, axis: int = 0) -> jnp.ndarray:
    """Inverse of :func:`exchange_halo`: drop ``halo`` entries at both ends."""
    if halo <= 0:
        return block
    return lax.slice_in_dim(block, halo, block.shape[axis] - halo, axis=axis)


def mask_out_of_image(
    extended: jnp.ndarray,
    halo: int,
    axis_name: str,
    axis: int,
    fill_value,
) -> jnp.ndarray:
    """Overwrite halo entries that lie *outside the global image* with
    ``fill_value``. Interior-shard halos (real neighbour rows) are kept.

    Used on extended *cost volumes*: a uniform out-of-image cost makes the
    SGM carry uniform, which the recurrence renormalizes away — giving exact
    global-border fresh-start behaviour (see ``ops/sgm._step``)."""
    if halo <= 0:
        return extended
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    pos = lax.broadcasted_iota(jnp.int32, extended.shape, axis)
    block = extended.shape[axis] - 2 * halo
    # global position of extended row `pos`: rows outside [0, n*block) are
    # out of image — on ANY shard (with multi-hop halos > block, shards
    # beyond the outermost also hold out-of-image rows)
    g = idx * block + pos - halo
    oob = (g < 0) | (g >= n * block)
    return jnp.where(oob, jnp.asarray(fill_value, extended.dtype), extended)

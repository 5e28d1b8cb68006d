"""Halo exchange over a mesh axis via ``lax.ppermute``.

The spatial-tile parallelism primitive (SURVEY.md §2.2 P2): each shard of a
row-sharded image block receives ``halo`` boundary rows from both mesh
neighbours so windowed ops (census windows) and SGM path scans can cross
tile edges. Must be called *inside* ``jax.shard_map`` — it uses collective
permutes over the named axis.

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
        raise ValueError(f"halo {halo} exceeds local block size {size}")

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
    size = extended.shape[axis]
    oob = ((idx == 0) & (pos < halo)) | ((idx == n - 1) & (pos >= size - halo))
    return jnp.where(oob, jnp.asarray(fill_value, extended.dtype), extended)

"""Stereo confidence measures — per-pixel reliability of an extracted
disparity, derived from the aggregated cost volume's minimum structure.

The reference has no confidence concept at all: its WTA winner is trusted
unconditionally (``std::min_element`` at
``/root/reference/src/CameraStereoVision.cpp:85``) and unmatched pixels hold
uninitialized memory (§2.3.3). A production stereo system needs calibrated
per-pixel reliability: to weight fusion (``models/fusion.py``), to gate
downstream consumers, and to sort points for budgeted export.

The measure of record is PKRN (peak-ratio naive, Hirschmüller/Scharstein's
confidence survey family): ``c2 / c1`` where ``c1`` is the winning aggregated
cost and ``c2`` the best cost outside the winner's ±1 neighbourhood (the same
second-best the uniqueness ratio test uses). Mapped to [0, 1) as
``1 - c1 / c2`` so 0 = ambiguous (tie) and ->1 = unambiguous. The Pallas
extraction kernels already compute ``c2`` for the uniqueness test, so the
fast path exports it for free; this module holds the shared math plus the
XLA volume-level oracle.
"""

from __future__ import annotations

import jax.numpy as jnp


def pkrn_confidence(
    best: jnp.ndarray,
    second: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    eps: float = 1e-3,
) -> jnp.ndarray:
    """Peak-ratio confidence in [0, 1): ``1 - (c1 + eps) / (c2 + eps)``.

    best/second: (H, W) winning and second-best (outside winner±1)
    aggregated costs. Negative costs are clamped at 0 (SGM aggregates are
    non-negative by construction; float paths can dip epsilon-negative).
    The additive ``eps`` makes an exact tie report 0 even at zero cost —
    two perfect matches (c1 = c2 = 0, common on noise-free fixtures) are
    still fully ambiguous, which the plain ``1 - c1/c2`` ratio misses.
    Invalid pixels (when ``valid`` given) report 0."""
    c1 = jnp.maximum(best.astype(jnp.float32), 0.0)
    c2 = jnp.maximum(second.astype(jnp.float32), c1)
    conf = 1.0 - (c1 + eps) / (c2 + eps)
    if valid is not None:
        conf = jnp.where(valid, conf, 0.0)
    return conf


def second_best_cost(vol: jnp.ndarray, d_int: jnp.ndarray) -> jnp.ndarray:
    """Best cost outside the winner's ±1 neighbourhood, over the LAST axis.

    vol: (..., D) aggregated volume; d_int: (...) integer winner. One-hot
    masked min — the same exclusion window as ``wta.uniqueness_mask`` (the
    immediate neighbours share the winner's parabola)."""
    import jax

    d_iota = jax.lax.broadcasted_iota(jnp.int32, vol.shape, vol.ndim - 1)
    near = jnp.abs(d_iota - d_int[..., None]) <= 1
    big = jnp.asarray(
        jnp.iinfo(vol.dtype).max if jnp.issubdtype(vol.dtype, jnp.integer)
        else jnp.inf,
        vol.dtype,
    )
    return jnp.min(jnp.where(near, big, vol), axis=-1)


def confidence_from_volume(
    vol: jnp.ndarray,
    d_int: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """PKRN confidence straight from an (..., D) aggregated volume and its
    integer WTA winner — the XLA oracle for the kernel-exported fast path."""
    from stereovisionarray_tpu.ops.wta import _value_at

    best = _value_at(vol, d_int)
    return pkrn_confidence(best, second_best_cost(vol, d_int), valid)

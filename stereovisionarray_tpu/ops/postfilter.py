"""Disparity post-filtering: 3x3 median + speckle suppression.

Standard production-SGM post-processing that the reference lacks entirely
(its output is raw WTA + a local refine pass,
``/root/reference/src/CameraStereoVision.cpp:85-95``): a median filter
knocks out single-pixel outliers the parabola can't fix, and a speckle
filter suppresses small floating blobs of locally-consistent-but-wrong
disparity that survive the LR check.

TPU shapes: the median is a 9-element sorting network (19 min/max pairs)
over shifted copies — pure VPU, no gathers; the speckle filter is the
O(HW) windowed-support approximation (box-count of similar-disparity
neighbours) instead of exact connected components (whose iteration count
is data-dependent — hostile to XLA's static control flow).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from stereovisionarray_tpu.ops.refine import box_filter2d
from stereovisionarray_tpu.ops.wta import INVALID_DISPARITY

__all__ = ["median3x3", "speckle_filter"]


def _shifted(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-replicated shift of (H, W)."""
    if dy > 0:
        x = jnp.concatenate([x[:1].repeat(dy, 0), x[:-dy]], axis=0)
    elif dy < 0:
        x = jnp.concatenate([x[-dy:], x[-1:].repeat(-dy, 0)], axis=0)
    if dx > 0:
        x = jnp.concatenate([x[:, :1].repeat(dx, 1), x[:, :-dx]], axis=1)
    elif dx < 0:
        x = jnp.concatenate([x[:, -dx:], x[:, -1:].repeat(-dx, 1)], axis=1)
    return x


def median3x3(
    disp: jnp.ndarray, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """3x3 median of a disparity map.

    Invalid neighbours (where ~valid) contribute the CENTER value instead,
    so the median never drags valid pixels toward the invalid sentinel;
    invalid centers stay invalid."""
    if valid is not None:
        src = jnp.where(valid, disp, 0.0)
    else:
        src = disp
    vals = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            n = _shifted(src, dy, dx)
            if valid is not None:
                nv = _shifted(valid, dy, dx)
                n = jnp.where(nv, n, src)
            vals.append(n)

    # 9-element median via a minimal sorting network (Paeth): 19 exchanges
    def mn(a, b):
        return jnp.minimum(a, b), jnp.maximum(a, b)

    p = vals
    p[1], p[2] = mn(p[1], p[2]); p[4], p[5] = mn(p[4], p[5]); p[7], p[8] = mn(p[7], p[8])
    p[0], p[1] = mn(p[0], p[1]); p[3], p[4] = mn(p[3], p[4]); p[6], p[7] = mn(p[6], p[7])
    p[1], p[2] = mn(p[1], p[2]); p[4], p[5] = mn(p[4], p[5]); p[7], p[8] = mn(p[7], p[8])
    p[0], p[3] = mn(p[0], p[3]); p[5], p[8] = mn(p[5], p[8]); p[4], p[7] = mn(p[4], p[7])
    p[3], p[6] = mn(p[3], p[6]); p[1], p[4] = mn(p[1], p[4]); p[2], p[5] = mn(p[2], p[5])
    p[4], p[7] = mn(p[4], p[7]); p[4], p[2] = mn(p[4], p[2]); p[6], p[4] = mn(p[6], p[4])
    p[4], p[2] = mn(p[4], p[2])
    med = p[4]

    if valid is not None:
        return jnp.where(valid, med, disp)
    return med


def speckle_filter(
    disp: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    max_diff: float = 1.0,
    window: int = 9,
    min_support: int = 12,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Suppress small isolated disparity blobs.

    A pixel survives if at least `min_support` pixels inside its
    `window`x`window` neighbourhood have disparity within `max_diff` of its
    own (windowed-support approximation of OpenCV-style speckle region
    filtering — a region smaller than ~min_support cannot provide the
    support, while large smooth regions always do).

    Returns (filtered_disp, new_valid); suppressed pixels get
    INVALID_DISPARITY.

    Method: EXACT windowed support — for every pixel, count window
    neighbours whose disparity is within `max_diff` of the pixel's own
    (window² shifted compares, all VPU passes over (H, W); ~100 MB of
    traffic at 540x768 with window=9 — cheap). Per-side counting means
    depth discontinuities keep both surfaces (each side supports itself),
    unlike local-mean schemes."""
    v = valid if valid is not None else disp >= 0
    r = window // 2
    support = jnp.zeros_like(disp)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            nd = _shifted(disp, dy, dx)
            nv = _shifted(v, dy, dx)
            ok = nv & (jnp.abs(disp - nd) <= max_diff)
            support = support + jnp.where(ok, 1.0, 0.0)
    keep = v & (support >= min_support)
    out = jnp.where(keep, disp, INVALID_DISPARITY)
    return out, keep

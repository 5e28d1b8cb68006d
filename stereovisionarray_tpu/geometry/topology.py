"""Camera-array pair topologies.

Host-side (static, shape-determining) generalization of the reference's
``getCameraPairs`` / ``getGroups`` (``/root/reference/src/functions.cpp:107-213``):
builds (P, 2) index arrays of (reference_cam, source_cam) matching pairs over a
rows x cols camera grid. The reference hard-codes a 5x5 grid with center
index 12; here the grid shape is a parameter and the center is derived.

Known reference bug NOT replicated (SURVEY.md §2.3): the per-camera CROSS
overload pushes ``{cameraNum, +5}`` instead of ``{cameraNum, cameraNum+5}``
(``/root/reference/src/functions.cpp:205``) — our ``cross_pairs_around``
returns the intended 4-neighbourhood.

These run at trace time (plain numpy) — pair lists are static metadata that
determine array shapes; only the per-pair compute is traced/jitted.
"""

from __future__ import annotations

import enum
from typing import List, Tuple

import numpy as np


class PairTopology(enum.Enum):
    """Mirror of the reference ``enum pairType``
    (``/root/reference/include/functions.h:8-19``), minus the two entries the
    reference declares but never implements (ORTHOGONAL, DIAGONAL)."""

    TO_CENTER = "to_center"
    TO_CENTER_SMALL = "to_center_small"
    MID_LEFT = "mid_left"
    MID_TOP = "mid_top"
    LINE_HORIZONTAL = "line_horizontal"
    LINE_VERTICAL = "line_vertical"
    CROSS = "cross"
    JUMP_CROSS = "jump_cross"

    @classmethod
    def _missing_(cls, value):
        # accept enum NAMES and any case ("CROSS", "Cross") — config files
        # and CLI flags naturally use the reference's upper-case spelling
        # (/root/reference/include/functions.h:8-19)
        if isinstance(value, str):
            low = value.lower()
            for member in cls:
                if member.value == low:
                    return member
        return None


def _grid_center(rows: int, cols: int) -> int:
    return (rows // 2) * cols + (cols // 2)


def _in_grid(r: int, c: int, rows: int, cols: int) -> bool:
    return 0 <= r < rows and 0 <= c < cols


def cross_pairs_around(cam: int, rows: int, cols: int, step: int = 1) -> np.ndarray:
    """(ref, src) pairs between `cam` and its 4-neighbourhood at distance
    `step` (step=2 gives the reference's JUMP_CROSS,
    ``/root/reference/src/functions.cpp:190-195``). Off-grid neighbours are
    dropped (the reference would index out of bounds)."""
    r, c = divmod(cam, cols)
    out = []
    for dr, dc in ((0, -step), (0, step), (-step, 0), (step, 0)):
        if _in_grid(r + dr, c + dc, rows, cols):
            out.append((cam, (r + dr) * cols + (c + dc)))
    return np.asarray(out, dtype=np.int32).reshape(-1, 2)


def camera_pairs(
    topology: PairTopology, rows: int = 5, cols: int = 5, center: int | None = None
) -> np.ndarray:
    """Build the (P, 2) pair list for a topology over a rows x cols grid.

    Semantics match ``getCameraPairs(cameras, pairType)``
    (``/root/reference/src/functions.cpp:148-196``) generalized from 5x5:
    every pair is (center_cam, other_cam)."""
    if center is None:
        center = _grid_center(rows, cols)
    r0, c0 = divmod(center, cols)
    n = rows * cols
    t = PairTopology(topology)

    if t == PairTopology.TO_CENTER:
        others = [i for i in range(n) if i != center]
        pairs = [(center, i) for i in others]
    elif t == PairTopology.TO_CENTER_SMALL:
        pairs = []
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if dr == 0 and dc == 0:
                    continue
                if _in_grid(r0 + dr, c0 + dc, rows, cols):
                    pairs.append((center, (r0 + dr) * cols + (c0 + dc)))
    elif t == PairTopology.MID_LEFT:
        pairs = [(center, center - 1)] if c0 > 0 else []
    elif t == PairTopology.MID_TOP:
        pairs = [(center, center - cols)] if r0 > 0 else []
    elif t == PairTopology.LINE_HORIZONTAL:
        pairs = [(center, r0 * cols + c) for c in range(cols) if c != c0]
    elif t == PairTopology.LINE_VERTICAL:
        pairs = [(center, r * cols + c0) for r in range(rows) if r != r0]
    elif t == PairTopology.CROSS:
        return cross_pairs_around(center, rows, cols, step=1)
    elif t == PairTopology.JUMP_CROSS:
        return cross_pairs_around(center, rows, cols, step=2)
    else:  # pragma: no cover
        raise ValueError(f"unknown topology {topology}")
    return np.asarray(pairs, dtype=np.int32).reshape(-1, 2)


def pair_groups(group_type: str, rows: int = 5, cols: int = 5) -> List[np.ndarray]:
    """Groups of pair lists — the reference's ``getGroups("CHESS")``
    (``/root/reference/src/functions.cpp:107-116``): CROSS neighbourhoods
    tiled around every even camera index. Returns a list of (P_i, 2) arrays."""
    if group_type.upper() != "CHESS":
        raise ValueError(f"unknown group type {group_type!r}")
    groups = []
    for cam in range(0, rows * cols, 2):
        g = cross_pairs_around(cam, rows, cols, step=1)
        if len(g):
            groups.append(g)
    return groups


def grid_positions(
    rows: int, cols: int, spacing: float, origin: Tuple[float, float] = (0.0, 0.0), z: float = 0.0
) -> np.ndarray:
    """(N, 3) camera centers for a planar grid — the reference's array layout
    (``/root/reference/src/CameraStereoVision.cpp:33-39``: 5x5, 0.05 m
    spacing, origin (-0.1, -0.1), z = -0.75)."""
    ys, xs = np.mgrid[0:rows, 0:cols].astype(np.float64)
    pos = np.stack(
        [origin[0] + xs * spacing, origin[1] + ys * spacing, np.full_like(xs, z)], axis=-1
    )
    return pos.reshape(-1, 3).astype(np.float32)

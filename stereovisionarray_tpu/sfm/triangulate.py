"""Triangulation of matched observations.

Midpoint method: for rays (C_i, d_i), the least-squares 3D point solves
``sum_i (I - d_i d_i^T) X = sum_i (I - d_i d_i^T) C_i`` — a 3x3 solve per
point, batched over all matches (no SVD, no per-point loop). The reference's
embryonic analogue is ``DepthMapToPoints3D``
(``/root/reference/src/functions.cpp:134-146``), which backprojects single
rays at known depth; here depth comes from ray intersection instead.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from stereovisionarray_tpu.geometry.camera import CameraArray

_HI = jax.lax.Precision.HIGHEST


def triangulate_midpoint(
    cameras: CameraArray,
    cam_idx: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    num_points: int,
    point_idx: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Triangulate ``num_points`` 3D points from grouped observations.

    cam_idx: (M,) camera id per observation; uv: (M, 2) pixels;
    valid: (M,) bool; point_idx: (M,) which track each observation belongs
    to. Returns (points (P, 3), ok (P,) bool — at least 2 valid rays and a
    well-conditioned normal system).
    """
    cams = cameras[cam_idx]
    dirs = cams.rays_each(uv)  # (M, 3) world-frame unit rays
    centers = cams.centers  # (M, 3)

    eye = jnp.eye(3, dtype=dirs.dtype)
    # per-observation projector onto the ray's orthogonal complement
    P_m = eye[None] - dirs[:, :, None] * dirs[:, None, :]  # (M, 3, 3)
    w = valid.astype(dirs.dtype)[:, None, None]
    A = jax.ops.segment_sum(P_m * w, point_idx, num_segments=num_points)
    b = jax.ops.segment_sum(
        jnp.einsum("mij,mj->mi", P_m, centers, precision=_HI) * w[:, :, 0],
        point_idx,
        num_segments=num_points,
    )
    n_rays = jax.ops.segment_sum(valid.astype(jnp.int32), point_idx, num_segments=num_points)

    # damped solve keeps padding rows (A = 0) finite
    A_safe = A + 1e-9 * eye[None]
    X = jnp.linalg.solve(A_safe, b[..., None])[..., 0]
    # conditioning check: smallest eigenvalue of A via det heuristic is
    # overkill here — two near-parallel rays give a tiny det
    ok = (n_rays >= 2) & (jnp.linalg.det(A_safe) > 1e-9)
    return X, ok


def reprojection_errors(
    cameras: CameraArray,
    points: jnp.ndarray,
    cam_idx: jnp.ndarray,
    point_idx: jnp.ndarray,
    uv: jnp.ndarray,
) -> jnp.ndarray:
    """(M, 2) pixel residuals of each observation (projection - measurement)."""
    cams = cameras[cam_idx]
    proj, _ = cams.project_each(points[point_idx])
    return proj - uv

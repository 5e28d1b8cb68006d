"""SO(3) / SE(3) exponential and logarithm maps (Rodrigues), batched.

Used by bundle adjustment and pose-graph refinement (``models/sfm.py``) to
parameterize camera rotations with minimal 3-vectors — the capability the
reference lacks entirely (its poses are hard-coded constants,
``/root/reference/src/CameraStereoVision.cpp:33-39``).

All functions broadcast over leading batch dims and are differentiable
(Taylor-guarded near theta = 0 so gradients are finite).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

_EPS = 1e-8


def _hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrices."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    # `where`-guarded divisions must never see a zero denominator, or the
    # non-selected branch poisons gradients with 0 * inf = NaN.
    theta2_safe = jnp.maximum(theta2, _EPS * _EPS)
    theta = jnp.sqrt(theta2_safe)
    small = theta2 < _EPS
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    W = _hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) -> axis-angle (..., 3)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    # vee of the antisymmetric part
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    small = theta < 1e-4
    sin_safe = jnp.where(small, 1.0, jnp.sin(theta))
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_safe))
    return scale[..., None] * v


def se3_exp(xi: jnp.ndarray):
    """Twist (..., 6) = (w, v) -> (R (...,3,3), t (...,3))."""
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta2_safe = jnp.maximum(theta2, _EPS * _EPS)
    theta = jnp.sqrt(theta2_safe)
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2_safe)
    W = _hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + a[..., None, None] * W + b[..., None, None] * (W @ W)
    V = eye + b[..., None, None] * W + c[..., None, None] * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, v, precision=_HI)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> twist (..., 6) = (w, v)."""
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    W = _hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - a/(2b)) W^2
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    coef = jnp.where(
        small, 1.0 / 12.0 + theta2 / 720.0, (1.0 - a / (2.0 * b)) / jnp.maximum(theta2, _EPS)
    )
    V_inv = eye - 0.5 * W + coef[..., None, None] * (W @ W)
    v = jnp.einsum("...ij,...j->...i", V_inv, t, precision=_HI)
    return jnp.concatenate([w, v], axis=-1)

"""Brown-Conrady lens distortion: distort/undistort points and resample
images onto the ideal pinhole grid.

The reference assumes perfect pinholes (``/root/reference/src/Camera.cpp:15-33``
has no distortion terms) because its inputs are synthetic renders; real
capture rigs (the ``Images/`` photos its face path loads,
``/root/reference/src/dlibFaceSelect.cpp:13-17``) have lens distortion that
breaks epipolar geometry — rectified scanline matching is only valid after
undistortion. The production recipe, implemented here: undistort each view
ONCE at ingest onto the ideal grid, then run the whole pinhole stack
(rectification, plane sweep, SfM) unchanged.

Model (OpenCV-compatible k1, k2, p1, p2 on normalized coords):
  r2 = x^2 + y^2,  radial = 1 + k1 r2 + k2 r2^2
  x_d = x radial + 2 p1 x y + p2 (r2 + 2 x^2)
  y_d = y radial + p1 (r2 + 2 y^2) + 2 p2 x y
Undistortion inverts by fixed-point iteration (jittable, static count) —
exact to float precision for the mild-to-moderate distortions (|k1| <~ 0.5)
real lenses exhibit.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from stereovisionarray_tpu.geometry.camera import CameraArray
from stereovisionarray_tpu.ops.warp import bilinear_sample

__all__ = [
    "Distortion",
    "distort_points",
    "undistort_points",
    "undistort_image",
    "distort_image",
]


class Distortion(NamedTuple):
    """Brown-Conrady coefficients (floats or scalar arrays)."""

    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0


def _apply(xy: jnp.ndarray, d: Distortion) -> jnp.ndarray:
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + d.k1 * r2 + d.k2 * r2 * r2
    xd = x * radial + 2.0 * d.p1 * x * y + d.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + d.p1 * (r2 + 2.0 * y * y) + 2.0 * d.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def distort_points(xy: jnp.ndarray, dist: Distortion) -> jnp.ndarray:
    """Ideal normalized coords (..., 2) -> distorted normalized coords."""
    return _apply(xy, dist)


def undistort_points(
    xy_d: jnp.ndarray, dist: Distortion, iterations: int = 8
) -> jnp.ndarray:
    """Distorted normalized coords (..., 2) -> ideal coords (fixed-point:
    x <- (x_d - tangential(x)) / radial(x), seeded at x_d)."""

    def body(_, xy):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + dist.k1 * r2 + dist.k2 * r2 * r2
        tx = 2.0 * dist.p1 * x * y + dist.p2 * (r2 + 2.0 * x * x)
        ty = dist.p1 * (r2 + 2.0 * y * y) + 2.0 * dist.p2 * x * y
        xn = (xy_d[..., 0] - tx) / radial
        yn = (xy_d[..., 1] - ty) / radial
        return jnp.stack([xn, yn], axis=-1)

    return jax.lax.fori_loop(0, iterations, body, xy_d)


def _norm(uv: jnp.ndarray, cam: CameraArray) -> jnp.ndarray:
    return jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy],
        axis=-1,
    )


def _denorm(xy: jnp.ndarray, cam: CameraArray) -> jnp.ndarray:
    return jnp.stack(
        [xy[..., 0] * cam.fx + cam.cx, xy[..., 1] * cam.fy + cam.cy],
        axis=-1,
    )


def _pixel_grid(h: int, w: int) -> jnp.ndarray:
    v, u = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack([u, v], axis=-1)


def undistort_image(
    image: jnp.ndarray, cam: CameraArray, dist: Distortion
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resample a DISTORTED capture onto the ideal pinhole grid of `cam`
    (single camera). For each ideal pixel: normalize -> distort -> sample
    the capture bilinearly. Returns (image (H, W), valid (H, W)); run once
    at ingest, then the pinhole stack applies unchanged."""
    h, w = image.shape[-2:]
    ideal = _norm(_pixel_grid(h, w), cam)
    src = _denorm(distort_points(ideal, dist), cam)
    return bilinear_sample(image, src, fill=0.0)


def distort_image(
    image: jnp.ndarray, cam: CameraArray, dist: Distortion,
    iterations: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of :func:`undistort_image` (apply lens distortion to an ideal
    render — fixture generation / round-trip tests): for each distorted
    pixel, undistort its coords and sample the ideal image."""
    h, w = image.shape[-2:]
    dgrid = _norm(_pixel_grid(h, w), cam)
    src = _denorm(undistort_points(dgrid, dist, iterations), cam)
    return bilinear_sample(image, src, fill=0.0)

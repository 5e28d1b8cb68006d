"""On-device face detection: multi-scale normalized cross-correlation
against a procedural average-face template, emitting dlib-layout landmarks.

Reference parity (``/root/reference/src/dlibFaceSelect.cpp:19-36``): the
reference runs dlib's HOG detector + a 100 MB 68-landmark model on the host
to gate compute to the subject's face. Here the detector is a bank of MXU/VPU
ops: an image pyramid, one conv per scale against a zero-mean face template
(eyes/brows/mouth/nose blobs inside an oval), variance-normalized to true
NCC, global peak -> face box -> a canonical 68-point landmark layout scaled
into the box. ``roi.mask.face_mask_from_landmarks`` then applies the exact
fillConvexPoly recipe of the reference (jaw 0-16 + brows 19/24).

This intentionally trades dlib's generality for zero model weights and
device-resident execution; it locks onto frontal faces regardless of whether
the face is brighter or darker than the background (the Otsu foreground
ellipse in ``roi.detect`` inverts on bright backgrounds — VERDICT r1).
``roi.face_mask`` falls back to the Otsu ellipse when no face is found.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["FaceDetection", "canonical_landmarks", "detect_face", "face_mask"]

_TH, _TW = 56, 44  # template size (rows, cols)


@functools.lru_cache(maxsize=1)
def _face_template() -> Tuple[np.ndarray, np.ndarray]:
    """((TH, TW) template, (TH, TW) support mask), both float32.

    The template's support is the face OVAL only — background pixels around
    the head get zero weight and are excluded from the patch statistics
    (masked NCC), so the detector is invariant to whether the surround is
    brighter or darker than the face (the failure mode of the Otsu
    foreground ellipse). Inside the oval: darker eye/brow/mouth blobs and a
    brighter nose ridge over uniform skin; soft (gaussian) features keep the
    response broad over ~±20% scale error between pyramid levels. The
    template is zero-mean and unit-norm OVER THE MASK."""
    h, w = _TH, _TW
    v, u = np.mgrid[0:h, 0:w].astype(np.float32)
    un, vn = u / (w - 1), v / (h - 1)  # normalized face-box coords

    def blob(cu, cv, su, sv):
        return np.exp(-0.5 * (((un - cu) / su) ** 2 + ((vn - cv) / sv) ** 2))

    oval = (((un - 0.5) / 0.46) ** 2 + ((vn - 0.52) / 0.50) ** 2 <= 1.0).astype(
        np.float32
    )
    t = np.full((h, w), 0.55, np.float32)  # skin
    t -= 0.30 * blob(0.30, 0.35, 0.11, 0.05)  # left eye
    t -= 0.30 * blob(0.70, 0.35, 0.11, 0.05)  # right eye
    t -= 0.18 * blob(0.26, 0.24, 0.13, 0.035)  # left brow
    t -= 0.18 * blob(0.74, 0.24, 0.13, 0.035)  # right brow
    t -= 0.25 * blob(0.50, 0.78, 0.16, 0.05)  # mouth
    t += 0.10 * blob(0.50, 0.48, 0.06, 0.16)  # nose ridge highlight
    t -= 0.10 * blob(0.38, 0.62, 0.05, 0.04)  # nostril shading
    t -= 0.10 * blob(0.62, 0.62, 0.05, 0.04)
    n = oval.sum()
    t = (t - (t * oval).sum() / n) * oval  # zero-mean over mask, 0 outside
    return (t / np.linalg.norm(t)).astype(np.float32), oval


@functools.lru_cache(maxsize=1)
def canonical_landmarks() -> np.ndarray:
    """(68, 2) dlib-layout landmarks in normalized face-box (u, v) coords.

    Only the subsets the reference consumes need geometric fidelity — the
    jaw contour 0-16 and brow points 19/24
    (``/root/reference/src/dlibFaceSelect.cpp:29-34``; ellipse variant uses
    0/8/16, ``:50-62``) — but all 68 are laid out plausibly."""
    pts = np.zeros((68, 2), np.float32)
    # jaw 0-16: ellipse from left ear through chin to right ear
    phi = np.linspace(-np.pi / 2, np.pi / 2, 17)
    pts[0:17, 0] = 0.5 + 0.5 * np.sin(phi)
    pts[0:17, 1] = 0.45 + 0.55 * np.cos(phi)
    # brows 17-21 (left), 22-26 (right)
    pts[17:22, 0] = np.linspace(0.13, 0.42, 5)
    pts[17:22, 1] = 0.24 - 0.04 * np.sin(np.linspace(0, np.pi, 5))
    pts[22:27, 0] = np.linspace(0.58, 0.87, 5)
    pts[22:27, 1] = 0.24 - 0.04 * np.sin(np.linspace(0, np.pi, 5))
    # nose bridge 27-30 + base 31-35
    pts[27:31, 0] = 0.5
    pts[27:31, 1] = np.linspace(0.32, 0.55, 4)
    pts[31:36, 0] = np.linspace(0.40, 0.60, 5)
    pts[31:36, 1] = 0.62
    # eyes 36-41 (left), 42-47 (right): hexagons
    ang = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    pts[36:42, 0] = 0.30 + 0.09 * np.cos(ang)
    pts[36:42, 1] = 0.35 + 0.045 * np.sin(ang)
    pts[42:48, 0] = 0.70 + 0.09 * np.cos(ang)
    pts[42:48, 1] = 0.35 + 0.045 * np.sin(ang)
    # mouth: outer 48-59, inner 60-67
    ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    pts[48:60, 0] = 0.50 + 0.16 * np.cos(ang)
    pts[48:60, 1] = 0.78 + 0.06 * np.sin(ang)
    ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    pts[60:68, 0] = 0.50 + 0.10 * np.cos(ang)
    pts[60:68, 1] = 0.78 + 0.035 * np.sin(ang)
    return pts


class FaceDetection(NamedTuple):
    box: jnp.ndarray  # (4,) u0, v0, width, height in pixels
    landmarks: jnp.ndarray  # (68, 2) pixel (u, v)
    score: jnp.ndarray  # peak NCC in [-1, 1]
    found: jnp.ndarray  # bool: score >= threshold


def _conv_valid(img: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """VALID 2D cross-correlation (1 feature) via conv_general_dilated."""
    return jax.lax.conv_general_dilated(
        img[None, None],
        kern[None, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]


@jax.jit
def _ncc_peak(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Peak masked-NCC score and its (v, u) template-top-left position on
    one pyramid level. img: (h, w) float32 >= template size. Patch mean and
    variance are computed over the template's oval support only."""
    t_np, m_np = _face_template()
    t = jnp.asarray(t_np)
    m = jnp.asarray(m_np)
    n = float(m_np.sum())
    s1 = _conv_valid(img, m)
    s2 = _conv_valid(img * img, m)
    cross = _conv_valid(img, t)  # t zero-mean over mask: patch mean cancels
    var = jnp.maximum(s2 - s1 * s1 / n, 1e-6)
    ncc = cross / jnp.sqrt(var)  # ||t|| == 1
    flat = jnp.argmax(ncc)
    vu = jnp.stack(jnp.unravel_index(flat, ncc.shape))
    return ncc.reshape(-1)[flat], vu


def detect_face(
    image: jnp.ndarray,
    num_scales: int = 6,
    scale_step: float = 0.8,
    threshold: float = 0.30,
) -> FaceDetection:
    """Multi-scale NCC face detection on an (H, W) grayscale image.

    The pyramid downscales the IMAGE by ``scale_step`` per level (template
    fixed), so detectable face widths span roughly
    ``[_TW, _TW / scale_step**(num_scales-1)]`` pixels. Each level is one
    jitted conv program (static shape per level, cached across calls)."""
    img = jnp.asarray(image, jnp.float32)
    h, w = img.shape
    # traced best-of-levels selection (jnp.where, not host comparisons):
    # the whole detector stays jittable, so array_depth_pipeline(use_roi=
    # True, roi_mode="face") composes under jit / lax.map like every other
    # stage (the level count and shapes are static — the Python loop only
    # lays out one conv program per pyramid level)
    best_score = jnp.float32(-2.0)
    best_u0 = jnp.float32(0.0)
    best_v0 = jnp.float32(0.0)
    best_bw = jnp.float32(_TW)
    best_bh = jnp.float32(_TH)
    for k in range(num_scales):
        s = scale_step ** k
        hs, ws = int(round(h * s)), int(round(w * s))
        if hs < _TH or ws < _TW:
            break
        lvl = img if k == 0 else jax.image.resize(img, (hs, ws), "linear")
        score, vu = _ncc_peak(lvl)
        take = score > best_score
        best_score = jnp.where(take, score, best_score)
        best_u0 = jnp.where(take, vu[1].astype(jnp.float32) / s, best_u0)
        best_v0 = jnp.where(take, vu[0].astype(jnp.float32) / s, best_v0)
        best_bw = jnp.where(take, jnp.float32(_TW / s), best_bw)
        best_bh = jnp.where(take, jnp.float32(_TH / s), best_bh)
    box = jnp.stack([best_u0, best_v0, best_bw, best_bh])
    lm = jnp.asarray(canonical_landmarks())
    landmarks = jnp.stack(
        [best_u0 + lm[:, 0] * best_bw, best_v0 + lm[:, 1] * best_bh], axis=-1
    )
    return FaceDetection(
        box=box,
        landmarks=landmarks,
        score=best_score,
        found=best_score >= threshold,
    )


def face_mask(image: jnp.ndarray, threshold: float = 0.30) -> jnp.ndarray:
    """(H, W) bool compute-gating mask: NCC face detection + the reference's
    fillConvexPoly landmark recipe, falling back to the Otsu foreground
    ellipse (``roi.detect``) when no face clears the threshold — full
    ``getFaceMask`` parity without dlib or model files."""
    from stereovisionarray_tpu.roi.detect import detect_face_ellipse
    from stereovisionarray_tpu.roi.mask import ellipse_mask, face_mask_from_landmarks

    det = detect_face(image, threshold=threshold)
    # compute both masks and select traced — `found` is a device scalar, so
    # a Python `if` would force a host sync and break jit (both branches are
    # a handful of image-sized elementwise ops; negligible next to the
    # pipeline this mask gates)
    lm_mask = face_mask_from_landmarks(image.shape, det.landmarks)
    roi = detect_face_ellipse(jnp.asarray(image, jnp.float32))
    ell = ellipse_mask(image.shape, roi.center, roi.axes, roi.angle)
    # nothing found anywhere -> don't gate at all (an unfound ellipse has
    # arbitrary center/axes from near-zero moments)
    ell = ell | ~roi.found
    return jnp.where(det.found, lm_mask, ell)

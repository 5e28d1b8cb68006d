"""Dataset / artifact I/O.

Fixes the reference's determinism hazard: ``getImagesPathsFromFolder``
iterates the directory in OS order (``/root/reference/src/functions.cpp:241-251``)
— the file list here is always lexicographically sorted. The ``saveImage`` /
``loadImage`` YAML persistence (``/root/reference/src/functions.cpp:331-346``)
becomes versioned ``.npz`` arrays with metadata; image export uses PNG.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".pgm", ".ppm")


def list_images_sorted(folder: str) -> List[str]:
    """Sorted absolute paths of all image files in `folder` (deterministic,
    unlike the reference's directory-iterator order)."""
    out = [
        os.path.join(folder, f)
        for f in sorted(os.listdir(folder))
        if f.lower().endswith(_IMAGE_EXTS)
    ]
    return out


def load_image_gray(path: str, half_res: bool = False) -> np.ndarray:
    """Load an image as float32 grayscale (H, W) in [0, 255]; optional 0.5x
    decimation matching the reference ingest
    (``/root/reference/src/CameraStereoVision.cpp:16-18``)."""
    import imageio.v3 as iio

    img = np.asarray(iio.imread(path), dtype=np.float32)
    if img.ndim == 3:
        img = img[..., :3] @ np.asarray([0.299, 0.587, 0.114], dtype=np.float32)
    if half_res:
        img = img[::2, ::2]
    return img


def save_png(path: str, array: np.ndarray, vmin: Optional[float] = None,
             vmax: Optional[float] = None) -> None:
    """Save a float array as an 8-bit PNG (normalized to [vmin, vmax]) — the
    artifact-file replacement for the reference's imshow windows
    (``/root/reference/src/functions.cpp:234-239``)."""
    import imageio.v3 as iio

    a = np.asarray(array, dtype=np.float32)
    lo = float(np.nanmin(a)) if vmin is None else vmin
    hi = float(np.nanmax(a)) if vmax is None else vmax
    scale = 255.0 / max(hi - lo, 1e-12)
    u8 = np.clip((a - lo) * scale, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    iio.imwrite(path, u8)


def save_array(path: str, arrays: Dict[str, np.ndarray], metadata: Optional[Dict] = None) -> None:
    """Persist named arrays + JSON metadata to a single .npz (the reference's
    ``saveImage`` role, but typed, versioned, and multi-array)."""
    import json

    payload = {k: np.asarray(v) for k, v in arrays.items()}
    payload["__meta__"] = np.frombuffer(
        json.dumps({"version": 1, **(metadata or {})}).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **payload)


def load_array(path: str) -> tuple[Dict[str, np.ndarray], Dict]:
    """Inverse of :func:`save_array` -> (arrays, metadata)."""
    import json

    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode()) if "__meta__" in z.files else {}
    return arrays, meta

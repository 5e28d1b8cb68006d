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
    (``/root/reference/src/CameraStereoVision.cpp:16-18``).

    Decodes through the native C++ codec (native/image_codec.cpp) when the
    toolchain is available; falls back to imageio (identical luma weights
    and decimation, covered by tests/test_native_loader.py)."""
    from stereovisionarray_tpu.datasets import native_loader

    if native_loader.native_available():
        try:
            return native_loader.decode_image(path, gray=True, half_res=half_res)
        except ValueError:
            pass  # format the native codec doesn't cover (e.g. jpeg)

    import imageio.v3 as iio

    img = np.asarray(iio.imread(path), dtype=np.float32)
    if img.ndim == 3:
        img = img[..., :3] @ np.asarray([0.299, 0.587, 0.114], dtype=np.float32)
    if half_res:
        img = img[::2, ::2]
    return img


def load_image_stack(paths, half_res: bool = False, threads: int = 4) -> np.ndarray:
    """Decode a list of same-shape images into an (N, H, W) float32 stack,
    using the native multi-threaded prefetch loader when available (the
    parallel replacement for the reference's sequential 25-view imread loop,
    ``/root/reference/src/CameraStereoVision.cpp:14-19``)."""
    from stereovisionarray_tpu.datasets import native_loader

    if native_loader.native_available():
        try:
            return native_loader.load_stack(list(paths), threads=threads, half_res=half_res)
        except ValueError:
            pass
    return np.stack([load_image_gray(p, half_res=half_res) for p in paths])


def save_png(path: str, array: np.ndarray, vmin: Optional[float] = None,
             vmax: Optional[float] = None) -> None:
    """Save a float array as an 8-bit PNG (normalized to [vmin, vmax]) — the
    artifact-file replacement for the reference's imshow windows
    (``/root/reference/src/functions.cpp:234-239``). Grayscale PNGs encode
    through the native C++ codec when available."""
    a = np.asarray(array, dtype=np.float32)
    lo = float(np.nanmin(a)) if vmin is None else vmin
    hi = float(np.nanmax(a)) if vmax is None else vmax
    scale = 255.0 / max(hi - lo, 1e-12)
    u8 = np.clip((a - lo) * scale, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if u8.ndim == 2 and path.lower().endswith(".png"):
        from stereovisionarray_tpu.datasets import native_loader

        if native_loader.native_available():
            native_loader.encode_png_gray(path, u8)
            return
    # imageio is an optional extra — only needed past the native branch
    import imageio.v3 as iio

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


def save_ply(
    path: str,
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    valid: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
    quality: Optional[np.ndarray] = None,
) -> int:
    """Write a binary little-endian PLY point cloud.

    The export side of the reconstruction API the reference only hints at
    (its `DepthMapToPoints3D` result is never persisted,
    ``/root/reference/src/functions.cpp:134-146``). Returns the number of
    points written.

    Args:
      points: (..., 3) float positions (flattened).
      colors: optional (..., 3) uint8 RGB per point.
      valid: optional (...) boolean filter.
      normals: optional (..., 3) float unit normals (nx, ny, nz).
      quality: optional (...) float per-point scalar (e.g. fusion
        confidence) written as the standard `quality` property.
    """
    pts = np.asarray(points, dtype=np.float32).reshape(-1, 3)
    col = None if colors is None else np.asarray(colors, dtype=np.uint8).reshape(-1, 3)
    nrm = None if normals is None else np.asarray(normals, dtype=np.float32).reshape(-1, 3)
    qual = None if quality is None else np.asarray(quality, dtype=np.float32).reshape(-1)
    if valid is not None:
        keep = np.asarray(valid).reshape(-1)
        pts = pts[keep]
        col = col[keep] if col is not None else None
        nrm = nrm[keep] if nrm is not None else None
        qual = qual[keep] if qual is not None else None
    n = pts.shape[0]
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    fields = [("xyz", "<f4", 3)]
    if nrm is not None:
        header += ["property float nx", "property float ny", "property float nz"]
        fields += [("normal", "<f4", 3)]
    if col is not None:
        header += ["property uchar red", "property uchar green", "property uchar blue"]
        fields += [("rgb", "u1", 3)]
    if qual is not None:
        header += ["property float quality"]
        fields += [("quality", "<f4")]
    header += ["end_header"]
    rec = np.zeros(n, dtype=fields)
    rec["xyz"] = pts
    if nrm is not None:
        rec["normal"] = nrm
    if col is not None:
        rec["rgb"] = col
    if qual is not None:
        rec["quality"] = qual
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(rec.tobytes())
    return n


def load_ply(path: str) -> tuple[np.ndarray, Optional[np.ndarray]]:
    """Read a PLY written by :func:`save_ply` -> (points (N,3) f32,
    colors (N,3) u8 or None). The property list is parsed generically, so
    files with normals/quality channels load too (extra channels are
    skipped; use numpy on the record directly if they are needed)."""
    type_map = {"float": "<f4", "uchar": "u1", "int": "<i4",
                "double": "<f8", "short": "<i2", "ushort": "<u2"}
    with open(path, "rb") as f:
        n = 0
        props = []  # (name, numpy type) in file order
        while True:
            line = f.readline().decode("ascii").strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            elif line.startswith("property"):
                _, ptype, name = line.split()
                props.append((name, type_map[ptype]))
            elif line == "end_header":
                break
        dtype = [(name, t) for name, t in props]
        rec = np.frombuffer(f.read(), dtype=dtype, count=n)
    pts = np.stack([rec["x"], rec["y"], rec["z"]], axis=-1).astype(np.float32)
    names = {name for name, _ in props}
    col = None
    if {"red", "green", "blue"} <= names:
        col = np.stack([rec["red"], rec["green"], rec["blue"]],
                       axis=-1).astype(np.uint8)
    return pts, col

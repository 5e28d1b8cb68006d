"""Middlebury stereo pair loading: PFM disparity ground truth + calib files.

The reference's only dataset interface is an unsorted directory scan plus a
YAML ground-truth blob (``/root/reference/src/functions.cpp:241-251,323-329``).
The Middlebury 2014/2021 layout (im0/im1.png, disp0/disp1.pfm, calib.txt with
cam0/cam1 intrinsics, doffs, baseline, ndisp) is the community-standard
format the BASELINE.json metrics (bad-2.0) are defined on, so it gets a
first-class loader. PFM I/O is self-contained (no OpenCV)."""

from __future__ import annotations

import os
import re
import struct
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------- #
# PFM
# ---------------------------------------------------------------------- #
def read_pfm(path: str) -> np.ndarray:
    """Read a PFM file -> float32 array (H, W) or (H, W, 3). Handles both
    endiannesses and the bottom-up scanline order PFM mandates."""
    with open(path, "rb") as f:
        header = f.readline().decode("latin-1").strip()
        if header not in ("PF", "Pf"):
            raise ValueError(f"not a PFM file: {path!r} (header {header!r})")
        color = header == "PF"
        dims = f.readline().decode("latin-1").strip()
        while dims.startswith("#"):  # comments
            dims = f.readline().decode("latin-1").strip()
        m = re.match(r"^(\d+)\s+(\d+)$", dims)
        if not m:
            raise ValueError(f"bad PFM dims line: {dims!r}")
        w, h = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().decode("latin-1").strip())
        little_endian = scale < 0
        count = w * h * (3 if color else 1)
        data = np.frombuffer(f.read(count * 4), dtype="<f4" if little_endian else ">f4")
        if data.size != count:
            raise ValueError(f"truncated PFM: {path!r}")
    shape = (h, w, 3) if color else (h, w)
    img = data.reshape(shape)
    return np.ascontiguousarray(img[::-1]).astype(np.float32)  # bottom-up -> top-down


def write_pfm(path: str, data: np.ndarray, scale: float = 1.0) -> None:
    """Write a float32 array (H, W) or (H, W, 3) as little-endian PFM."""
    data = np.asarray(data, dtype=np.float32)
    if data.ndim == 2:
        header = b"Pf"
    elif data.ndim == 3 and data.shape[2] == 3:
        header = b"PF"
    else:
        raise ValueError(f"PFM supports (H,W) or (H,W,3), got {data.shape}")
    h, w = data.shape[:2]
    with open(path, "wb") as f:
        f.write(header + b"\n")
        f.write(f"{w} {h}\n".encode())
        f.write(f"{-abs(scale)}\n".encode())  # negative => little-endian
        f.write(np.ascontiguousarray(data[::-1]).astype("<f4").tobytes())


# ---------------------------------------------------------------------- #
# calib.txt
# ---------------------------------------------------------------------- #
def parse_calib(text: str) -> Dict[str, object]:
    """Parse a Middlebury ``calib.txt``: ``cam0=[f 0 cx; 0 f cy; 0 0 1]``
    matrices plus scalar fields (doffs, baseline, width, height, ndisp...)."""
    out: Dict[str, object] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or "=" not in line:
            continue
        key, val = line.split("=", 1)
        key, val = key.strip(), val.strip()
        if val.startswith("["):
            rows = [
                [float(x) for x in row.split()]
                for row in val.strip("[]").split(";")
                if row.strip()
            ]
            out[key] = np.asarray(rows, dtype=np.float32)
        else:
            try:
                out[key] = int(val)
            except ValueError:
                try:
                    out[key] = float(val)
                except ValueError:
                    out[key] = val
    return out


@dataclass
class MiddleburyPair:
    left: np.ndarray  # (H, W) float32 grayscale
    right: np.ndarray
    gt_disparity: Optional[np.ndarray]  # (H, W) float32, inf/0 = unknown
    calib: Dict[str, object]

    @property
    def ndisp(self) -> int:
        return int(self.calib.get("ndisp", 256))

    @property
    def valid_gt(self) -> Optional[np.ndarray]:
        if self.gt_disparity is None:
            return None
        return np.isfinite(self.gt_disparity) & (self.gt_disparity > 0)


def _to_gray(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, dtype=np.float32)
    if img.ndim == 3:
        img = img[..., :3] @ np.asarray([0.299, 0.587, 0.114], dtype=np.float32)
    return img


def load_middlebury_pair(folder: str, half_res: bool = False) -> MiddleburyPair:
    """Load a Middlebury scene directory (im0.png, im1.png, disp0.pfm,
    calib.txt). half_res mirrors the reference's 0.5x ingest downscale
    (``/root/reference/src/CameraStereoVision.cpp:18``) — image AND disparity
    are scaled together."""
    import imageio.v3 as iio

    left = _to_gray(iio.imread(os.path.join(folder, "im0.png")))
    right = _to_gray(iio.imread(os.path.join(folder, "im1.png")))
    gt = None
    disp_path = os.path.join(folder, "disp0.pfm")
    if os.path.exists(disp_path):
        gt = read_pfm(disp_path)
        if gt.ndim == 3:
            gt = gt[..., 0]
    calib_path = os.path.join(folder, "calib.txt")
    calib: Dict[str, object] = {}
    if os.path.exists(calib_path):
        with open(calib_path) as f:
            calib = parse_calib(f.read())
    if half_res:
        left = left[::2, ::2]
        right = right[::2, ::2]
        if gt is not None:
            gt = gt[::2, ::2] * 0.5
        if "ndisp" in calib:
            calib["ndisp"] = int(np.ceil(int(calib["ndisp"]) / 2))
    return MiddleburyPair(left=left, right=right, gt_disparity=gt, calib=calib)

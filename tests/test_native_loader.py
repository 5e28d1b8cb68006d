"""Native C++ codec + prefetch loader (native/, datasets/native_loader.py).

Golden-checked against imageio / numpy oracles; loader ordering must be
deterministic (submission order) regardless of thread timing.
"""

import os
import struct

import numpy as np
import pytest

from stereovisionarray_tpu.datasets.middlebury import write_pfm
from stereovisionarray_tpu.datasets.native_loader import (
    PrefetchLoader,
    decode_image,
    load_stack,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native codec"
)


def _write_png(path, arr):
    import imageio.v3 as iio

    iio.imwrite(path, arr)


def test_png_gray_matches_imageio(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(33, 47), dtype=np.uint8)
    p = str(tmp_path / "g.png")
    _write_png(p, img)
    got = decode_image(p, gray=True)
    np.testing.assert_allclose(got, img.astype(np.float32), atol=1e-4)


def test_png_rgb_luma_matches_io_path(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(21, 19, 3), dtype=np.uint8)
    p = str(tmp_path / "c.png")
    _write_png(p, img)
    got = decode_image(p, gray=True)
    want = img[..., :3].astype(np.float32) @ np.asarray([0.299, 0.587, 0.114], np.float32)
    np.testing.assert_allclose(got, want, atol=0.01)
    rgb = decode_image(p, gray=False)
    np.testing.assert_allclose(rgb, img.astype(np.float32), atol=1e-4)


def test_pgm_ppm_binary(tmp_path):
    rng = np.random.default_rng(2)
    g = rng.integers(0, 255, size=(9, 11), dtype=np.uint8)
    p = str(tmp_path / "x.pgm")
    with open(p, "wb") as f:
        f.write(b"P5\n11 9\n255\n" + g.tobytes())
    np.testing.assert_allclose(decode_image(p), g.astype(np.float32))

    c = rng.integers(0, 255, size=(5, 7, 3), dtype=np.uint8)
    p2 = str(tmp_path / "x.ppm")
    with open(p2, "wb") as f:
        f.write(b"P6\n7 5\n255\n" + c.tobytes())
    rgb = decode_image(p2, gray=False)
    np.testing.assert_allclose(rgb, c.astype(np.float32))


def test_pfm_round_trip(tmp_path):
    rng = np.random.default_rng(3)
    d = rng.uniform(0.1, 64.0, size=(13, 17)).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    write_pfm(p, d)
    got = decode_image(p, gray=True)
    np.testing.assert_allclose(got, d, rtol=1e-6)


def test_bmp_24bit(tmp_path):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, size=(6, 5, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    data_size = stride * h
    p = str(tmp_path / "x.bmp")
    with open(p, "wb") as f:
        f.write(b"BM" + struct.pack("<IHHI", 54 + data_size, 0, 0, 54))
        f.write(struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 0, 0, 0, 0))
        for row in range(h - 1, -1, -1):  # bottom-up
            line = bytearray()
            for x in range(w):
                r, g, b = img[row, x]
                line += bytes([b, g, r])
            line += b"\0" * (stride - w * 3)
            f.write(line)
    rgb = decode_image(p, gray=False)
    np.testing.assert_allclose(rgb, img.astype(np.float32))


def test_half_res_matches_python_decimation(tmp_path):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(20, 30), dtype=np.uint8)
    p = str(tmp_path / "g.png")
    _write_png(p, img)
    got = decode_image(p, gray=True, half_res=True)
    np.testing.assert_allclose(got, img[::2, ::2].astype(np.float32), atol=1e-4)


def test_decode_errors_are_reported(tmp_path):
    p = str(tmp_path / "bad.png")
    with open(p, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\nnot really")
    with pytest.raises(ValueError):
        decode_image(p)
    with pytest.raises(ValueError):
        decode_image(str(tmp_path / "missing.png"))


def test_prefetch_loader_order_and_stack(tmp_path):
    rng = np.random.default_rng(6)
    paths = []
    imgs = []
    for i in range(16):
        img = rng.integers(0, 255, size=(12, 14), dtype=np.uint8)
        p = str(tmp_path / f"f_{i:02d}.png")
        _write_png(p, img)
        paths.append(p)
        imgs.append(img)
    # deliberately more threads than capacity to stress slot reuse
    with PrefetchLoader(paths, threads=4, capacity=3) as ld:
        frames = list(ld)
    assert len(frames) == 16
    for got, want in zip(frames, imgs):
        np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-4)

    stack = load_stack(paths, threads=3)
    assert stack.shape == (16, 12, 14)


def test_prefetch_loader_error_propagates(tmp_path):
    good = str(tmp_path / "a.png")
    _write_png(good, np.zeros((4, 4), dtype=np.uint8))
    bad = str(tmp_path / "b.png")
    with open(bad, "wb") as f:
        f.write(b"garbage")
    with PrefetchLoader([good, bad], threads=2, capacity=2) as ld:
        it = iter(ld)
        next(it)
        with pytest.raises(ValueError):
            next(it)


def test_native_png_encoder_round_trip(tmp_path):
    from stereovisionarray_tpu.datasets.native_loader import encode_png_gray

    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, size=(23, 31), dtype=np.uint8)
    p = str(tmp_path / "enc.png")
    encode_png_gray(p, img)
    # our own decoder and imageio both read it back exactly
    np.testing.assert_allclose(decode_image(p), img.astype(np.float32))
    import imageio.v3 as iio

    np.testing.assert_array_equal(np.asarray(iio.imread(p)), img)


def test_save_png_uses_native_encoder(tmp_path):
    from stereovisionarray_tpu.datasets import save_png

    arr = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
    p = str(tmp_path / "art.png")
    save_png(p, arr, vmin=0.0, vmax=1.0)
    got = decode_image(p)
    want = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    np.testing.assert_allclose(got, want.astype(np.float32))

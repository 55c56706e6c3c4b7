"""Native C++ loader (ldso_tpu/native): libpng decode + threaded
prefetcher must agree with the pure-Python PNG decoder and serve frames
in order. The .so builds lazily from loader.cc with the system g++."""

import os
import struct
import zlib

import numpy as np
import pytest

from ldso_tpu import native
from ldso_tpu.io import datasets


def encode_png_gray(img: np.ndarray) -> bytes:
    """Minimal 8-bit grayscale PNG writer (filter 0 rows)."""
    img = np.asarray(img, np.uint8)
    h, w = img.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native loader could not be built (no g++/libpng?)")
    return True


class TestNativeDecode:
    def test_png_roundtrip_matches_python_decoder(self, built):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (48, 64), np.uint8)
        data = encode_png_gray(img)
        out = native.decode_gray(data)
        assert out is not None and out.shape == (48, 64)
        ref = datasets._decode_png_gray(data)
        np.testing.assert_array_equal(out, ref)
        np.testing.assert_array_equal(out, img.astype(np.float32))

    def test_garbage_returns_none(self, built):
        assert native.decode_gray(b"not an image") is None

    def test_decode_image_prefers_native(self, built):
        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        out = datasets.decode_image(encode_png_gray(img))
        np.testing.assert_array_equal(out, img.astype(np.float32))


class TestPrefetcher:
    def test_in_order_frames(self, built, tmp_path):
        rng = np.random.default_rng(1)
        paths = []
        imgs = []
        for i in range(12):
            img = rng.integers(0, 256, (32, 40), np.uint8)
            p = tmp_path / f"{i:03d}.png"
            p.write_bytes(encode_png_gray(img))
            paths.append(str(p))
            imgs.append(img)
        pf = native.Prefetcher(paths, n_threads=3, ahead=4)
        try:
            for i in range(12):
                out = pf.get(i)
                np.testing.assert_array_equal(out, imgs[i].astype(np.float32))
        finally:
            pf.close()

    def test_kitti_reader_uses_prefetcher(self, built, tmp_path):
        rng = np.random.default_rng(2)
        seq = tmp_path / "00"
        (seq / "image_0").mkdir(parents=True)
        imgs = []
        for i in range(6):
            img = rng.integers(0, 256, (32, 48), np.uint8)
            (seq / "image_0" / f"{i:06d}.png").write_bytes(encode_png_gray(img))
            imgs.append(img)
        np.savetxt(seq / "times.txt", np.arange(6) * 0.1)
        (seq / "calib.txt").write_text(
            "P0: 40.0 0.0 24.0 0.0 0.0 40.0 16.0 0.0 0.0 0.0 1.0 0.0\n")
        ds = datasets.KittiDataset(str(seq))
        for i in range(6):
            frame, ts, exp = ds.get_image(i)
            np.testing.assert_allclose(frame, imgs[i].astype(np.float32))
            assert exp == 1.0
        assert ds._pf is not None, "native prefetcher should be active"

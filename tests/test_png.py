"""PNG decoder (utils/image.py::load_png) — stb_image-parity tests.

The decoder plays the role of the reference's texture loading
(Texture.cu:8-40 via stbi_load); PIL serves only as the test oracle.
"""

import io
import os

import numpy as np
import pytest

from fypraytracer_tpu.utils.image import (
    _png_unfilter_numpy,
    load_image,
    load_png,
    save_png,
)

PIL = pytest.importorskip("PIL.Image")

REF_ASSETS = "/root/reference/FYPRayTracer/Assets/3D Models/Test"


def _pil_png_bytes(arr: np.ndarray, mode: str) -> bytes:
    buf = io.BytesIO()
    PIL.fromarray(arr, mode=mode).save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.parametrize("mode,channels", [("L", 1), ("RGB", 3), ("RGBA", 4)])
def test_load_png_matches_pil(tmp_path, mode, channels):
    rng = np.random.default_rng(0)
    # gradient + noise exercises all five scanline filters in the encoder
    h, w = 48, 37
    base = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
    img = (base + rng.integers(0, 60, (h, w, channels))).astype(np.uint8)
    if channels == 1:
        img = img[:, :, 0]
    p = tmp_path / "t.png"
    p.write_bytes(_pil_png_bytes(img, mode))
    ours = load_png(str(p))
    ref = np.asarray(PIL.open(str(p)))
    if ref.ndim == 2:
        ref = ref[:, :, None]
    assert np.array_equal(ours, ref)


def test_load_png_palette(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 8, (16, 16), dtype=np.uint8)
    pil = PIL.fromarray(img, mode="P")
    pil.putpalette([c for i in range(256) for c in (i, 255 - i, i // 2)])
    p = tmp_path / "pal.png"
    pil.save(str(p), format="PNG")
    ours = load_png(str(p))
    ref = np.asarray(PIL.open(str(p)).convert("RGB"))
    assert np.array_equal(ours, ref)


def test_numpy_unfilter_matches_native(tmp_path):
    """Forces every filter type through the NumPy fallback."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    p = tmp_path / "f.png"
    p.write_bytes(_pil_png_bytes(img, "RGB"))
    import struct
    import zlib

    data = p.read_bytes()
    pos, idat = 8, bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    out = _png_unfilter_numpy(raw, 24, 24 * 3, 3).reshape(24, 24, 3)
    assert np.array_equal(out, np.asarray(PIL.open(str(p))))


def test_roundtrip_save_load(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (20, 31, 3), dtype=np.uint8)
    p = tmp_path / "rt.png"
    save_png(str(p), img)
    assert np.array_equal(load_png(str(p)), img)
    assert np.array_equal(load_image(str(p)), img)


@pytest.mark.skipif(not os.path.isdir(REF_ASSETS),
                    reason="reference assets unavailable")
def test_reference_textures_decode_exactly():
    for name in ("bananaDiffuse.png", "toasterBaseColor.png"):
        p = os.path.join(REF_ASSETS, name)
        ours = load_png(p)
        ref = np.asarray(PIL.open(p))
        assert np.array_equal(ours, ref), name

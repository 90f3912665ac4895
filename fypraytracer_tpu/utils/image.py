"""Image IO — BMP writer/reader matching the reference's output format.

``MisUtils::SaveABGRToBMP`` (MisUtils.cpp:13-95) writes 24-bit bottom-up
BMPs from packed ABGR; the benchmark comparison reads such files back with
a row flip (MisUtils.cpp:118-148).  We reproduce both so golden images are
byte-compatible, and add PNG via zlib for convenience.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def save_bmp(path: str, rgb8: np.ndarray) -> None:
    """Write (H, W, 3) uint8 RGB as a 24-bit bottom-up BMP
    (MisUtils.cpp:13-95 layout: BGR pixel order, rows padded to 4 bytes)."""
    h, w = rgb8.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    bgr = rgb8[::-1, :, ::-1]  # bottom-up rows, BGR channels
    pad = np.zeros((h, row_bytes - w * 3), np.uint8)
    body = np.concatenate([bgr.reshape(h, -1), pad], axis=1).tobytes()
    with open(path, "wb") as f:
        f.write(header + info + body)


def load_bmp(path: str) -> np.ndarray:
    """Read a 24-bit BMP back to (H, W, 3) uint8 RGB (row flip applied,
    as MisUtils.cpp:129-137 does for comparisons)."""
    data = open(path, "rb").read()
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    offset = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    row_bytes = (w * 3 + 3) & ~3
    arr = np.frombuffer(data, np.uint8, count=row_bytes * abs(h), offset=offset)
    arr = arr.reshape(abs(h), row_bytes)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:
        arr = arr[::-1]  # bottom-up -> top-down
    return arr[:, :, ::-1].copy()  # BGR -> RGB


def save_png(path: str, rgb8: np.ndarray) -> None:
    """Minimal PNG writer (no external deps)."""
    h, w = rgb8.shape[:2]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb8[y].tobytes() for y in range(h))
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))

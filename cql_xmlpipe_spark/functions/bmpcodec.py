"""Pure-numpy codec for uncompressed 24-bit BMP (BITMAPINFOHEADER).

The container has no image libraries (no PIL/opencv), but the multimodal
decode path should not be a stub either — BMP's uncompressed 24bpp form
is a public, fixed layout (54-byte header, BGR rows padded to 4 bytes,
bottom-up unless height is negative) that decodes with nothing but
``np.frombuffer`` + slicing. This is the real ``use_codec=True`` body for
``operators/multimodal.py``; formats that genuinely need external codecs
(PNG/JPEG/MP4) still raise there, with this as the supported in-container
format.

Layout reference: the Windows BITMAPFILEHEADER (14 bytes) +
BITMAPINFOHEADER (40 bytes) structures, as publicly documented.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")   # magic, file size, res1, res2, data offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # size, w, h, planes, bpp, comp, ...


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP into an (h, w, 3) uint8 RGB array."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    _, _, _, _, data_offset = _FILE_HEADER.unpack_from(payload, 0)
    (hdr_size, width, height, planes, bpp, compression, *_rest) = _INFO_HEADER.unpack_from(
        payload, 14
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24bpp BMP supported (bpp={bpp}, comp={compression})")
    bottom_up = height > 0
    h, w = abs(height), width
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3  # rows padded to 4-byte boundaries
    need = data_offset + stride * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} bytes, need {need}")
    rows = np.frombuffer(payload, np.uint8, stride * h, data_offset).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as uncompressed 24-bit BMP."""
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3), got {px.shape}")
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, RGB -> BGR
    data = rows.tobytes()
    header = _FILE_HEADER.pack(b"BM", 54 + len(data), 0, 0, 54) + _INFO_HEADER.pack(
        40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data

"""Pure-struct codec for uncompressed RGB24 AVI (RIFF 'AVI ' / DIB).

The container has no video libraries (no ffmpeg/opencv), but the video
modality should not stay a stub when a public fixed layout exists: AVI
with a single 'vids' stream of uncompressed bottom-up 24bpp DIB frames
('DIB ' handler, BI_RGB) is fully specified by the Microsoft RIFF/AVI
documentation — a RIFF container of plain struct-packed chunks, no
compression anywhere. This is the video sibling of
``functions/bmpcodec.py`` (images) and ``functions/wavcodec.py``
(audio): it makes ``operators/multimodal.py``'s ``use_codec=True``
frame-sampling path real for this format; containers that genuinely
need external codecs (MP4/H.264/VP9) still raise there.

Frame pixel layout is IDENTICAL to the BMP pixel array (bottom-up rows,
BGR byte order, stride padded to 4 bytes) — only the headers differ,
which is why plain AVI/DIB decodes with ``np.frombuffer`` + slicing.

Layout reference: RIFF 'AVI ' form with
``LIST hdrl (avih + LIST strl (strh 'vids'/'DIB ' + strf
BITMAPINFOHEADER)) + LIST movi ('00db' chunks) + idx1``, as publicly
documented (AVIMAINHEADER / AVISTREAMHEADER / BITMAPINFOHEADER).
"""

from __future__ import annotations

import struct

import numpy as np

#: AVIMAINHEADER payload (56 bytes): us_per_frame, max_bytes_per_sec,
#: padding_granularity, flags, total_frames, initial_frames, streams,
#: suggested_buffer, width, height, reserved[4]
_AVIH = struct.Struct("<IIIIIIIIII4I")
#: AVISTREAMHEADER payload (56 bytes): fccType, fccHandler, flags,
#: priority+language, initial_frames, scale, rate, start, length,
#: suggested_buffer, quality, sample_size, rcFrame (4 int16)
_STRH = struct.Struct("<4s4sIIIIIIIIII4h")
#: BITMAPINFOHEADER (40 bytes) — same layout bmpcodec uses
_BMIH = struct.Struct("<IiiHHIIiiII")

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _stride(w: int) -> int:
    return (w * 3 + 3) & ~3


def _dib_bytes(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> bottom-up padded BGR rows (the DIB frame
    payload; identical rule to bmpcodec's pixel array)."""
    h, w = px.shape[:2]
    stride = _stride(w)
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def _dib_decode(buf: bytes, w: int, h: int) -> np.ndarray:
    stride = _stride(w)
    if len(buf) < stride * h:
        raise ValueError(f"truncated DIB frame: {len(buf)} bytes, need {stride * h}")
    rows = np.frombuffer(buf, np.uint8, stride * h).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)
    return px[::-1, :, ::-1].copy()  # bottom-up -> top-down, BGR -> RGB


def encode_avi(frames: list[np.ndarray], fps: int) -> bytes:
    """Encode equal-size (h, w, 3) uint8 RGB frames as uncompressed
    RGB24 AVI at integer ``fps``."""
    if not frames:
        raise ValueError("need at least one frame")
    if fps <= 0:
        raise ValueError(f"fps must be positive, got {fps}")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.ndim != 3 or f.shape != (h, w, 3):
            raise ValueError(f"all frames must be ({h}, {w}, 3), got {f.shape}")
    n = len(frames)
    frame_size = _stride(w) * h

    avih = _AVIH.pack(
        1_000_000 // fps, frame_size * fps, 0, _AVIF_HASINDEX,
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = _STRH.pack(
        b"vids", b"DIB ", 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
        0, 0, np.int16(w), np.int16(h),
    )
    strf = _BMIH.pack(40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)

    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) + b"strl" \
        + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl)) + b"hdrl" \
        + b"avih" + struct.pack("<I", len(avih)) + avih + strl

    movi_body = b"movi"
    idx = b""
    # idx1 offsets are relative to the start of the 'movi' fourcc
    for f in frames:
        dib = _dib_bytes(f)
        idx += b"00db" + struct.pack("<III", _AVIIF_KEYFRAME, len(movi_body), len(dib))
        movi_body += b"00db" + struct.pack("<I", len(dib)) + dib
        if len(dib) % 2:  # RIFF chunks are word-aligned
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    idx1 = b"idx1" + struct.pack("<I", len(idx)) + idx

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> tuple[list[np.ndarray], int]:
    """Decode an uncompressed RGB24 AVI into ((h, w, 3) RGB frames, fps).

    Walks the RIFF chunk tree by struct sizes alone; only the
    'vids'/'DIB ' single-stream BI_RGB 24bpp form is supported — the
    honest boundary of a codec-free container parser."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/'AVI ' magic)")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    if len(payload) < 8 + riff_size:
        raise ValueError(
            f"truncated AVI: {len(payload)} bytes, RIFF header claims {8 + riff_size}"
        )

    w = h = fps = None
    frames: list[np.ndarray] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal w, h, fps
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            data_start = pos + 8
            data_end = data_start + size
            if data_end > end:
                raise ValueError(f"truncated chunk {fourcc!r} at {pos}")
            if fourcc == b"LIST":
                walk(buf, data_start + 4, data_end)  # skip list type fourcc
            elif fourcc == b"strh":
                t, handler, *_rest = _STRH.unpack_from(buf, data_start)
                if t != b"vids" or handler not in (b"DIB ", b"\x00\x00\x00\x00"):
                    raise ValueError(
                        f"only uncompressed 'vids'/'DIB ' streams supported, "
                        f"got {t!r}/{handler!r}"
                    )
                scale, rate = struct.unpack_from("<II", buf, data_start + 20)
                if scale == 0 or rate % scale:
                    raise ValueError(f"non-integer frame rate {rate}/{scale}")
                fps = rate // scale
            elif fourcc == b"strf":
                (_, bw, bh, _, bpp, comp, *_r) = _BMIH.unpack_from(buf, data_start)
                if bpp != 24 or comp != 0:
                    raise ValueError(
                        f"only uncompressed 24bpp AVI supported (bpp={bpp}, comp={comp})"
                    )
                w, h = bw, abs(bh)
            elif fourcc == b"00db":
                if w is None or h is None:
                    raise ValueError("frame chunk before stream format header")
                frames.append(_dib_decode(buf[data_start:data_end], w, h))
            # avih / idx1 / junk chunks: nothing needed beyond strh/strf
            pos = data_end + (size % 2)  # word alignment

    walk(payload, 12, 8 + struct.unpack_from("<I", payload, 4)[0])
    if fps is None:
        raise ValueError("no 'vids' stream header found")
    if not frames:
        raise ValueError("no frame chunks found")
    return frames, fps

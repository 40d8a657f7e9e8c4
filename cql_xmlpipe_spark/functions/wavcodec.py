"""Pure-struct codec for canonical PCM16 mono WAV (RIFF/WAVE).

The container has no audio libraries (no librosa/soundfile/pydub), but —
exactly like the BMP image path (``functions/bmpcodec.py``) — the audio
decode path should not be a stub: the canonical linear-PCM WAV layout is
public and fixed (12-byte RIFF header, 24-byte ``fmt `` chunk, ``data``
chunk of little-endian int16 frames) and decodes with nothing but
``struct`` + ``np.frombuffer``. This is the real ``use_codec=True`` body
for ``operators/multimodal.decode_audio_features``; compressed formats
that genuinely need external codecs (MP3/AAC/OGG) still raise there, with
this as the supported in-container format.

``encode_wav`` emits byte-for-byte the same layout the Python stdlib
``wave`` module writes for PCM16 mono (RIFF size = 36 + data, fmt size
16, WAVE_FORMAT_PCM) — the fixture script pins that equivalence with an
independent stdlib-``wave`` encoder, and ``decode_wav`` walks the chunk
list generically so payloads with extra chunks (LIST/INFO) still decode.

Layout reference: the public RIFF/WAVE specification (Microsoft/IBM,
1991), as mirrored by the CPython ``wave`` module.
"""

from __future__ import annotations

import struct

import numpy as np

_FMT_CHUNK = struct.Struct("<HHIIHH")  # format, channels, rate, byte rate, align, bits


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode a 1-D int16 array as canonical PCM16 mono WAV."""
    s = np.asarray(samples)
    if s.ndim != 1:
        raise ValueError(f"expected 1-D sample array, got shape {s.shape}")
    if s.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {s.dtype}")
    if sample_rate <= 0:
        raise ValueError(f"bad sample rate {sample_rate}")
    data = s.astype("<i2", copy=False).tobytes()
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + _FMT_CHUNK.pack(1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return header + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 mono WAV payload into (int16 sample array, rate).

    Walks the RIFF chunk list (chunks are word-aligned: odd-sized chunks
    carry a pad byte), so extra chunks before/after ``fmt ``/``data`` are
    tolerated; non-PCM, multi-channel, or non-16-bit payloads raise."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    fmt = None
    data = None
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        body_off = off + 8
        if body_off + size > len(payload):
            raise ValueError(
                f"truncated WAV: chunk {cid!r} claims {size} bytes, "
                f"{len(payload) - body_off} remain"
            )
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"bad fmt chunk size {size}")
            fmt = _FMT_CHUNK.unpack_from(payload, body_off)
        elif cid == b"data":
            data = payload[body_off : body_off + size]
        off = body_off + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, channels, rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or channels != 1 or bits != 16:
        raise ValueError(
            "only PCM16 mono WAV supported "
            f"(format={audio_format}, channels={channels}, bits={bits})"
        )
    if len(data) % 2:
        raise ValueError(f"odd data chunk length {len(data)} for 16-bit frames")
    return np.frombuffer(data, "<i2").copy(), rate

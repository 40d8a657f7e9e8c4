"""Generate the pinned AVI frame-sample fixture for the codec-true
video gate (multimodal_frame_sample_codec).

The Spark path under test is: synth_frames(text) → encode_avi →
decode_avi → seek-grid frame sampling → per-frame sha256, all
executor-side. This script recomputes the ground truth WITHOUT the
codec under test:

- frames come from the shared input generator
  (operators/multimodal.synth_frames — the input data, not the system
  under test);
- the sampling rule is RESTATED here straight on the frame arrays
  (grid ts = 0, every_ms, … < n·1000//fps; source frame =
  min(n-1, ts·fps // 1000)) and each sampled frame's sha256 is taken
  from the ORIGINAL synthesized pixels, never passing through
  encode_avi/decode_avi — so the gate only passes if the codec
  round-trip is bit-lossless AND the engine's seek rule matches; and
- payload_md5 comes from an INDEPENDENT RIFF/AVI assembly written here
  against the public AVIMAINHEADER / AVISTREAMHEADER /
  BITMAPINFOHEADER layout (not imported from functions/avicodec.py),
  so the gate byte-pins encode_avi's exact output too.

Keyed by md5(text) so one fixture serves every sf it was generated over
(sf0.001 + sf0.01 + sf0.1); the oracle carries a loud coverage guard
against testdata drift, same as the BMP/WAV fixtures.

A second output pins the codec-true video FEATURES gate
(multimodal_video_features_codec): the feature math (stack mean luma,
mean absolute frame-to-frame difference) is RESTATED here directly on
the synthesized frames — never through the codec — so the gate again
only passes on a bit-lossless round-trip.

Output: tests/fixtures/avi_frame_samples.parquet
  (text_md5 VARCHAR, payload_md5 VARCHAR, n_frames INT, fps INT,
   frame_idx INT, ts_ms INT, frame_hex VARCHAR)
        tests/fixtures/avi_video_features.parquet
  (text_md5 VARCHAR, payload_md5 VARCHAR, n_frames INT, fps INT,
   duration_ms INT, width INT, height INT, mean_luma DOUBLE,
   motion DOUBLE)
"""

from __future__ import annotations

import hashlib
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from cql_xmlpipe_spark.operators.multimodal import synth_frames

EVERY_MS = 300  # the gate's sampling grid


def encode_avi_independent(frames: list[np.ndarray], fps: int) -> bytes:
    """Uncompressed RGB24 AVI per the public layout, assembled from the
    spec with explicit loops — not imported from functions/avicodec.py;
    the point is to pin the engine encoder's bytes against a second
    implementation."""
    h, w = frames[0].shape[:2]
    stride = (w * 3 + 3) & ~3
    n = len(frames)
    frame_size = stride * h

    def dib(px: np.ndarray) -> bytes:
        rows = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up
            row = bytearray()
            for x in range(w):
                r, g, b = px[y, x]
                row += bytes([int(b), int(g), int(r)])  # BGR
            row += b"\x00" * (stride - len(row))
            rows += row
        return bytes(rows)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_size * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIIIIIIIIII4h",
        b"vids", b"DIB ", 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    strl = (
        b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) + b"strl"
        + b"strh" + struct.pack("<I", len(strh)) + strh
        + b"strf" + struct.pack("<I", len(strf)) + strf
    )
    hdrl = (
        b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl)) + b"hdrl"
        + b"avih" + struct.pack("<I", len(avih)) + avih + strl
    )
    movi_body = b"movi"
    idx = b""
    for f in frames:
        d = dib(f)
        idx += b"00db" + struct.pack("<III", 0x10, len(movi_body), len(d))
        movi_body += b"00db" + struct.pack("<I", len(d)) + d
        if len(d) % 2:
            movi_body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    idx1 = b"idx1" + struct.pack("<I", len(idx)) + idx
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def video_features_independent(frames: list[np.ndarray], fps: int) -> dict:
    """The feature math of operators/multimodal.video_features_from_frames,
    restated directly on the synthesized frame arrays (no codec
    round-trip)."""
    stack = np.stack(frames).astype(np.float64)
    n = len(frames)
    return {
        "n_frames": n,
        "fps": int(fps),
        "duration_ms": int(n * 1000 // fps),
        "width": int(frames[0].shape[1]),
        "height": int(frames[0].shape[0]),
        "mean_luma": float(stack.mean()),
        "motion": float(np.abs(np.diff(stack, axis=0)).mean()) if n > 1 else 0.0,
    }


def main() -> None:
    import duckdb

    out_rows: list[dict] = []
    feat_rows: list[dict] = []
    seen: set[str] = set()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for (text,) in duckdb.sql(
            f"SELECT text FROM '/root/testdata/{sf}/documents.parquet'"
        ).fetchall():
            key = hashlib.md5(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            seen.add(key)
            frames, fps = synth_frames(text)
            payload_md5 = hashlib.md5(
                encode_avi_independent(frames, fps)
            ).hexdigest()
            n = len(frames)
            dur = n * 1000 // fps
            for i, ts in enumerate(range(0, max(dur, 1), EVERY_MS)):
                src = min(n - 1, ts * fps // 1000)
                out_rows.append(
                    {
                        "text_md5": key,
                        "payload_md5": payload_md5,
                        "n_frames": n,
                        "fps": fps,
                        "frame_idx": i,
                        "ts_ms": ts,
                        "frame_hex": hashlib.sha256(frames[src].tobytes()).hexdigest(),
                    }
                )
            feat_rows.append(
                {
                    "text_md5": key,
                    "payload_md5": payload_md5,
                    **video_features_independent(frames, fps),
                }
            )
    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures",
    )
    out = os.path.join(fixtures, "avi_frame_samples.parquet")
    schema = {
        "text_md5": pa.string(), "payload_md5": pa.string(),
        "n_frames": pa.int32(), "fps": pa.int32(),
        "frame_idx": pa.int32(), "ts_ms": pa.int32(), "frame_hex": pa.string(),
    }
    table = {c: pa.array([r[c] for r in out_rows], t) for c, t in schema.items()}
    pq.write_table(pa.table(table), out, compression="zstd")
    print(f"wrote {out}: {len(seen)} distinct texts, {len(out_rows)} sample rows")

    feat_out = os.path.join(fixtures, "avi_video_features.parquet")
    feat_schema = {
        "text_md5": pa.string(), "payload_md5": pa.string(),
        "n_frames": pa.int32(), "fps": pa.int32(), "duration_ms": pa.int32(),
        "width": pa.int32(), "height": pa.int32(),
        "mean_luma": pa.float64(), "motion": pa.float64(),
    }
    feat_table = {c: pa.array([r[c] for r in feat_rows], t) for c, t in feat_schema.items()}
    pq.write_table(pa.table(feat_table), feat_out, compression="zstd")
    print(f"wrote {feat_out}: {len(feat_rows)} rows")


if __name__ == "__main__":
    main()

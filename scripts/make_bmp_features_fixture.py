"""Generate the pinned BMP-features fixture for the codec-true
multimodal gate (multimodal_image_features_codec).

The Spark path under test is: synth_pixels(text) → encode_bmp →
decode_bmp → feature math, all executor-side. This script recomputes the
ground truth WITHOUT the codec under test:

- pixels come from the same shared input generator
  (operators/multimodal.synth_pixels — the input data, not the system
  under test);
- features (mean_r/g/b, sharpness) are computed DIRECTLY from the pixel
  array, never passing through encode_bmp/decode_bmp — so a
  compensating encode/decode bug pair cannot cancel out in the feature
  columns' favor only if it is pixel-preserving, and
- payload_md5 comes from an INDEPENDENT struct-pack BMP encoder written
  here against the public BITMAPFILEHEADER/BITMAPINFOHEADER layout (the
  same hand-rolled layout tests/test_multimodal.py pins byte-level), so
  the gate byte-pins encode_bmp's exact output too.

Keyed by md5(text) so one fixture serves every sf it was generated over
(sf0.001 + sf0.01 + sf0.1); the oracle carries a loud coverage guard
against testdata drift, same as the simhash fixture.

Output: tests/fixtures/bmp_image_features.parquet
  (text_md5 VARCHAR, payload_md5 VARCHAR, width INT, height INT,
   mean_r/g/b DOUBLE, sharpness DOUBLE).
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

from cql_xmlpipe_spark.operators.multimodal import synth_pixels


def encode_bmp_independent(px: np.ndarray) -> bytes:
    """Uncompressed 24bpp BMP per the public layout: 14-byte file header +
    40-byte info header, bottom-up BGR rows padded to 4 bytes. Written
    from the spec, not imported from functions/bmpcodec.py — the point is
    to pin the engine encoder's bytes against a second implementation."""
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            r, g, b = px[y, x]
            row += bytes([int(b), int(g), int(r)])  # BGR
        row += b"\x00" * (stride - len(row))
        rows += row
    header = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    return header + bytes(rows)


def features(px: np.ndarray) -> dict:
    """Exactly the feature math of operators/multimodal.decode_image_features,
    applied straight to the pixel array (no codec round-trip)."""
    f = px.astype(np.float64)
    gray = f.mean(axis=2)
    w = px.shape[1]
    return {
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "mean_r": float(f[:, :, 0].mean()),
        "mean_g": float(f[:, :, 1].mean()),
        "mean_b": float(f[:, :, 2].mean()),
        "sharpness": float(np.abs(np.diff(gray, axis=1)).mean()) if w > 1 else 0.0,
    }


def main() -> None:
    import duckdb

    rows: dict[str, dict] = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for (text,) in duckdb.sql(
            f"SELECT text FROM '/root/testdata/{sf}/documents.parquet'"
        ).fetchall():
            key = hashlib.md5(text.encode("utf-8")).hexdigest()
            if key in rows:
                continue
            px = synth_pixels(text)
            rec = features(px)
            rec["payload_md5"] = hashlib.md5(encode_bmp_independent(px)).hexdigest()
            rows[key] = rec
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "bmp_image_features.parquet",
    )
    cols = ["payload_md5", "width", "height", "mean_r", "mean_g", "mean_b", "sharpness"]
    table = {"text_md5": pa.array(list(rows), pa.string())}
    for c in cols:
        typ = pa.int32() if c in ("width", "height") else (
            pa.string() if c == "payload_md5" else pa.float64())
        table[c] = pa.array([rows[k][c] for k in rows], typ)
    pq.write_table(pa.table(table), out, compression="zstd")
    print(f"wrote {out}: {len(rows)} distinct texts")


if __name__ == "__main__":
    main()

"""Generate the pinned feature fixture for multimodal_image_features —
the DEFAULT (codec-free) decode path.

The default path's "pixels" are a deterministic spec: seed a numpy
RandomState from sha256(payload)[:8] and draw h×w×3 uint8s, where
payload = the document's UTF-8 text bytes and (w, h) come from the
metadata struct (doc_id % 640 + 1, doc_id % 480 + 1). This script
recomputes the features straight from that spec — reading the parquet
with DuckDB and running the seed/draw/stat math here, NOT through the
Spark operator — so the gate pins the mapInPandas plumbing (modality
routing, Arrow batching, schema, per-row math) against an out-of-band
recompute. The codec-TRUE path (real BMP encode/decode) is separately
gated by multimodal_image_features_codec with a fully independent
encoder; this fixture closes the last rows-only gap for the default
path.

Keyed by (doc_id, md5(text)) because width/height derive from doc_id —
one fixture serves every sf it was generated over; the oracle errors
loudly on any uncovered image row (testdata drift).

Output: tests/fixtures/fake_image_features.parquet
  (doc_id BIGINT, text_md5 VARCHAR, width INT, height INT,
   mean_r/mean_g/mean_b/sharpness DOUBLE).
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def fake_features(text: str, doc_id: int) -> tuple[int, int, float, float, float, float]:
    payload = text.encode("utf-8")
    w, h = doc_id % 640 + 1, doc_id % 480 + 1
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    px = np.random.RandomState(seed).randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    pxf = px.astype(np.float64)
    gray = pxf.mean(axis=2)
    sharp = float(np.abs(np.diff(gray, axis=1)).mean()) if w > 1 else 0.0
    return (
        w,
        h,
        float(pxf[:, :, 0].mean()),
        float(pxf[:, :, 1].mean()),
        float(pxf[:, :, 2].mean()),
        sharp,
    )


def main() -> None:
    rows: dict[tuple[int, str], tuple] = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        docs = con.sql(
            f"SELECT doc_id, text, md5(text) AS tmd5 FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet') "
            f"WHERE doc_id % 3 = 0 ORDER BY doc_id"
        ).fetchall()
        n_new = 0
        for doc_id, text, tmd5 in docs:
            key = (doc_id, tmd5)
            if key not in rows:
                rows[key] = fake_features(text, doc_id)
                n_new += 1
        print(f"{sf}: {len(docs)} image docs, {n_new} new fixture rows")

    keys = sorted(rows)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "fake_image_features.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([k[0] for k in keys], pa.int64()),
                "text_md5": pa.array([k[1] for k in keys], pa.string()),
                "width": pa.array([rows[k][0] for k in keys], pa.int32()),
                "height": pa.array([rows[k][1] for k in keys], pa.int32()),
                "mean_r": pa.array([rows[k][2] for k in keys], pa.float64()),
                "mean_g": pa.array([rows[k][3] for k in keys], pa.float64()),
                "mean_b": pa.array([rows[k][4] for k in keys], pa.float64()),
                "sharpness": pa.array([rows[k][5] for k in keys], pa.float64()),
            }
        ),
        out,
        compression="zstd",
    )
    print(f"wrote {out}: {len(keys)} rows")


if __name__ == "__main__":
    main()

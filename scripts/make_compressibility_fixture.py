"""Generate the pinned zlib-compressibility fixture for the
text_compressibility gate.

DuckDB has no zlib scalar, so the compressed size is pinned by fixture:
this script recomputes len(zlib.compress(utf8(text), level=6)) straight
from the parquet texts — no Spark, no engine imports — and the oracle
derives every other gate column (n_bytes, ratio, band) in SQL from it,
so the gate checks the engine's Column math and mapInPandas plumbing,
not just a fixture echo. Keyed by md5(text) so one fixture serves every
sf it was generated over (sf0.001 + sf0.01 + sf0.1); the oracle carries
the same loud coverage guard as the other fixtures.

Output: tests/fixtures/zlib_compressibility.parquet (text_md5, z_bytes).
"""

from __future__ import annotations

import hashlib
import os
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

ZLIB_LEVEL = 6  # functions/text.ZLIB_LEVEL, restated: the fixture pins the spec


def main() -> None:
    import duckdb

    rows: dict[str, int] = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for (text,) in duckdb.sql(
            f"SELECT text FROM '/root/testdata/{sf}/documents.parquet'"
        ).fetchall():
            key = hashlib.md5(text.encode("utf-8")).hexdigest()
            if key not in rows:
                rows[key] = len(zlib.compress(text.encode("utf-8"), ZLIB_LEVEL))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "zlib_compressibility.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "text_md5": pa.array(list(rows), pa.string()),
                "z_bytes": pa.array(list(rows.values()), pa.int64()),
            }
        ),
        out,
        compression="zstd",
    )
    print(f"wrote {out}: {len(rows)} distinct texts")


if __name__ == "__main__":
    main()

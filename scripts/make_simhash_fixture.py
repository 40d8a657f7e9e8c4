"""Generate the pinned SimHash fixture for the dedup_simhash oracle.

SimHash signatures hinge on xxhash64, which DuckDB cannot compute, so the
gate needs precomputed ground truth. This script recomputes every
document's 64-bit SimHash INDEPENDENTLY of the Spark operator: a
clean-room pure-Python XXH64 (public algorithm spec, seed 42 = Spark's
``xxhash64`` seed, UTF-8 bytes) feeds the same bit-vote construction. The
scalar hash is asserted against Spark-produced vectors before generating
(see tests/test_property_kernels.py for the cross-check against live
Spark).

Keyed by md5(text) — not doc_id — so one fixture serves every sf whose
documents appear here (sf0.001 + sf0.01 + sf0.1; exact clones share a
key and, necessarily, a signature). The oracle SQL carries a coverage
guard that errors loudly if any document md5 is absent, so testdata
drift produces a diagnosable failure instead of a silently-empty CTE.

Output: tests/fixtures/simhash_documents.parquet (text_md5 VARCHAR,
simhash BIGINT).
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

_P1, _P2, _P3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
_P4, _P5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
_M = (1 << 64) - 1

#: Spark xxhash64 test vectors (captured from a live session; the fixture
#: generator refuses to run if the clean-room hash diverges from them).
SPARK_VECTORS = {
    "": -7444071767201028348,
    "foo": -3075308222547705278,
    "hello world": 7620854247404556961,
    "Ünïcode": 5165345491381651733,
    "key agg row": -7147265066264814048,
}


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 per the public spec; signed result like Spark's xxhash64."""
    n, i = len(data), 0
    if n >= 32:
        v1, v2 = (seed + _P1 + _P2) & _M, (seed + _P2) & _M
        v3, v4 = seed & _M, (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = (_rotl(h ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M), 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def simhash(text: str) -> int:
    """Mirror of operators/dedup.simhash_signatures: +1/-1 bit votes from
    xxhash64 of each token occurrence; bit set iff votes > 0."""
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]
    votes = [0] * 64
    for t in toks:
        u = xxh64(t.encode("utf-8")) & _M
        for i in range(64):
            votes[i] += 1 if (u >> i) & 1 else -1
    sig = 0
    for i in range(64):
        if votes[i] > 0:
            sig |= 1 << i
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def main() -> None:
    for s, want in SPARK_VECTORS.items():
        got = xxh64(s.encode("utf-8"))
        assert got == want, f"clean-room xxh64 diverges on {s!r}: {got} != {want}"

    import duckdb

    rows: dict[str, int] = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for text, in duckdb.sql(
            f"SELECT text FROM '/root/testdata/{sf}/documents.parquet'"
        ).fetchall():
            key = hashlib.md5(text.encode("utf-8")).hexdigest()
            if key not in rows:
                rows[key] = simhash(text)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "simhash_documents.parquet",
    )
    pq.write_table(
        pa.table({"text_md5": pa.array(list(rows), pa.string()),
                  "simhash": pa.array(list(rows.values()), pa.int64())}),
        out,
        compression="zstd",
    )
    print(f"wrote {out}: {len(rows)} distinct texts")


if __name__ == "__main__":
    main()

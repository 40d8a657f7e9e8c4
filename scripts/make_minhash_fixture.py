"""Generate the pinned MinHash band-key fixture for the LSH-fed oracles.

The minhash family (``dedup_minhash_lsh``, ``dedup_cluster_assign``,
``dedup_graph_degree``, ``dedup_survivor_selection``,
``dedup_incremental_probe``) generates candidates with banded LSH over
seeded-xxhash64 MinHash signatures (operators/dedup.py: N_MINHASH=64,
N_BANDS=16).  Banded LSH is probabilistic-recall below J≈0.85, so an
"exact all-pairs" oracle is only equivalent while the corpus happens to
contain no pair in the banding's miss zone — a property the driver's
per-round testdata regeneration does not preserve (round 7 observed an
organic J=0.8 pair at sf0.1).  Instead of guarding that zone, the
oracles model the banding itself: this script recomputes every distinct
document's 16 band keys INDEPENDENTLY of the Spark operator — the same
clean-room pure-Python XXH64 already used by the SimHash fixture
(public algorithm spec, seed 42 = Spark's default), extended with the
fixed-width long/int input paths Spark's ``xxhash64`` uses for numeric
columns, self-checked against Spark-captured vectors below.  DuckDB
then performs the banded candidate join + exact-Jaccard verify in plain
SQL, which is exact FOR ANY CORPUS.  Recall versus the exact pair set
is a separately-gated measurement (``dedup_minhash_recall``), not an
assumption.

Pipeline mirrored (single definition in operators/dedup.py):
  toks     = lowercased [^a-z0-9]+-split word tokens
  shingles = distinct space-joined 3-token shingles
  hs       = distinct xxhash64(shingle_utf8, seed=42)      (string path)
  mh_i     = min_h xxhash64(h, i)   i in 0..63   (long path, int chain)
  key_b    = xxhash64(mh_{4b}, mh_{4b+1}, mh_{4b+2}, mh_{4b+3})

Keyed by md5(text) — not doc_id — so one fixture serves every sf whose
documents appear here (sf0.001 + sf0.01 + sf0.1; exact clones share a
key and, necessarily, band keys — which is also what makes the oracle's
banded join equivalent to the engine's exact-duplicate-collapsed one).
Documents with zero 3-shingles are excluded, mirroring the operator's
``size(hs) > 0`` filter; the oracle's coverage guard only demands
shingle-bearing texts.

Output: tests/fixtures/minhash_bands.parquet
        (text_md5 VARCHAR, band INTEGER, key BIGINT) — 16 rows per text.
"""

from __future__ import annotations

import hashlib
import os
import re
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from make_simhash_fixture import SPARK_VECTORS, xxh64

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

#: Spark xxhash64 vectors for the NUMERIC input paths (captured from a
#: live session; the generator refuses to run if the clean-room model
#: diverges).  Key: (python expression description) -> signed result.
SPARK_NUMERIC_VECTORS = [
    # xxhash64(CAST(123456789 AS BIGINT))
    (("long", 123456789), 3415128141240069951),
    # xxhash64(CAST(-987654321 AS BIGINT))
    (("long", -987654321), 5435279837322829586),
    # xxhash64(CAST(0 AS BIGINT))
    (("long", 0), -5252525462095825812),
    # xxhash64(CAST(123456789 AS BIGINT), 7) — long then INT literal chain
    (("long_int", 123456789, 7), -3438796756276296065),
    # xxhash64(11L, 22L, 33L, 44L) — 4-long chain (the band-key shape)
    (("chain4", 11, 22, 33, 44), -9033293537546336914),
]


def _rotl_vec(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix_vec(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    return h ^ (h >> np.uint64(32))


def xxh64_long_vec(vals: np.ndarray, seeds) -> np.ndarray:
    """Spark xxhash64 of a LONG input (XXH64 of 8-byte LE), vectorized;
    ``seeds`` may be a scalar or an array broadcastable with ``vals``."""
    seeds = np.asarray(seeds, dtype=np.uint64)
    h = seeds + _P5 + np.uint64(8)
    h = h ^ (_rotl_vec(vals * _P2, 31) * _P1)
    h = _rotl_vec(h, 27) * _P1 + _P4
    return _fmix_vec(h)


def xxh64_int_vec(val: int, seeds: np.ndarray) -> np.ndarray:
    """Spark xxhash64 of an INT input (XXH64 of 4-byte LE) under a
    VECTOR of seeds — the mh_i = min(xxhash64(h, i)) re-hash shape."""
    h = seeds + _P5 + np.uint64(4)
    # pre-multiplied in Python ints: scalar uint64 overflow warns in numpy
    mult = np.uint64(((val & 0xFFFFFFFF) * 0x9E3779B185EBCA87) & ((1 << 64) - 1))
    h = h ^ mult
    h = _rotl_vec(h, 23) * _P2 + _P3
    return _fmix_vec(h)


def _scalar_long(val: int, seed: int) -> int:
    return xxh64(struct.pack("<q", val), seed & ((1 << 64) - 1))


def _scalar_int(val: int, seed: int) -> int:
    return xxh64(struct.pack("<i", val), seed & ((1 << 64) - 1))


def _signed(u: np.ndarray) -> np.ndarray:
    return u.view(np.int64) if isinstance(u, np.ndarray) else np.int64(u)


def self_check() -> None:
    for s, want in SPARK_VECTORS.items():
        got = xxh64(s.encode("utf-8"))
        assert got == want, f"string path diverges on {s!r}: {got} != {want}"
    for vec, want in SPARK_NUMERIC_VECTORS:
        if vec[0] == "long":
            got = _scalar_long(vec[1], 42)
            gotv = int(xxh64_long_vec(np.array([vec[1]]).astype(np.uint64),
                                      np.uint64(42)).view(np.int64)[0])
        elif vec[0] == "long_int":
            h1 = _scalar_long(vec[1], 42)
            got = _scalar_int(vec[2], h1)
            gotv = int(xxh64_int_vec(
                vec[2],
                xxh64_long_vec(np.array([vec[1]]).astype(np.uint64),
                               np.uint64(42))).view(np.int64)[0])
        else:  # chain4
            h = 42
            for v in vec[1:]:
                h = _scalar_long(v, h)
            got = h
            hv = np.full(1, 42, dtype=np.uint64)
            for v in vec[1:]:
                hv = xxh64_long_vec(np.array([v]).astype(np.uint64), hv)
            gotv = int(hv.view(np.int64)[0])
        want_u = want & ((1 << 64) - 1)
        got_s = got - (1 << 64) if got >= (1 << 63) else got
        assert got_s == want, f"scalar numeric path diverges on {vec}: {got_s} != {want}"
        assert gotv == want, f"numpy numeric path diverges on {vec}: {gotv} != {want}"
    # scalar vs numpy agreement on random longs (both seeds scalar/vector)
    rng = np.random.default_rng(7)
    sample = rng.integers(-(1 << 62), 1 << 62, size=64, dtype=np.int64)
    vec_out = xxh64_long_vec(sample.astype(np.uint64), np.uint64(42)).view(np.int64)
    for v, got in zip(sample.tolist(), vec_out.tolist()):
        want = _scalar_long(v, 42)
        want = want - (1 << 64) if want >= (1 << 63) else want
        assert got == want, f"vec/scalar long mismatch at {v}"


N_MINHASH = 64
N_BANDS = 16
_ROWS = N_MINHASH // N_BANDS


def band_keys_for_text(text: str) -> list[int] | None:
    """The 16 Spark band keys for one document text, or None if the text
    has no 3-shingle (such docs never enter the LSH)."""
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]
    if len(toks) < 3:
        return None
    sh = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
    hs = np.array(
        sorted({xxh64(s.encode("utf-8")) for s in sh}), dtype=np.int64
    ).astype(np.uint64)
    t = xxh64_long_vec(hs, np.uint64(42))
    mh = np.empty(N_MINHASH, dtype=np.int64)
    for i in range(N_MINHASH):
        mh[i] = xxh64_int_vec(i, t).view(np.int64).min()
    seeds = np.full(N_BANDS, 42, dtype=np.uint64)
    lanes = mh.reshape(N_BANDS, _ROWS).astype(np.uint64)
    for r in range(_ROWS):
        seeds = xxh64_long_vec(lanes[:, r], seeds)
    return seeds.view(np.int64).tolist()


def main() -> None:
    self_check()

    import duckdb

    keys: list[str] = []
    bands: list[int] = []
    vals: list[int] = []
    seen: set[str] = set()
    n_no_shingle = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for (text,) in duckdb.sql(
            f"SELECT text FROM '/root/testdata/{sf}/documents.parquet'"
        ).fetchall():
            key = hashlib.md5(text.encode("utf-8")).hexdigest()
            if key in seen:
                continue
            seen.add(key)
            bk = band_keys_for_text(text)
            if bk is None:
                n_no_shingle += 1
                continue
            for b, v in enumerate(bk):
                keys.append(key)
                bands.append(b)
                vals.append(v)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "minhash_bands.parquet",
    )
    pq.write_table(
        pa.table({
            "text_md5": pa.array(keys, pa.string()),
            "band": pa.array(bands, pa.int32()),
            "key": pa.array(vals, pa.int64()),
        }),
        out,
        compression="zstd",
    )
    print(
        f"wrote {out}: {len(seen) - n_no_shingle} distinct texts "
        f"({n_no_shingle} zero-shingle texts excluded), {len(keys)} band rows"
    )


if __name__ == "__main__":
    main()

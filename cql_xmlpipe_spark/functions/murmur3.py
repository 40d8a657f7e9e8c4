"""Cassandra Murmur3Partitioner token (B9) — bit-faithful implementation.

The reference delegates ``token(pk)`` to the server (``Query.java:151-153``),
whose Murmur3Partitioner computes MurmurHash3_x64_128 with seed 0 over the
key's serialized bytes and takes the FIRST 64-bit half (h1) as the token,
normalizing Long.MIN_VALUE to Long.MAX_VALUE.

Two semantics quirks of Cassandra's Java port are reproduced deliberately:

* 16-byte BLOCKS compose bytes UNSIGNED (``& 0xff``) little-endian, but
  TAIL bytes are SIGN-EXTENDED (``(long) key[i] << shift``) — a
  divergence from the canonical C for tail bytes >= 0x80 that Cassandra
  keeps for on-disk compatibility; token parity requires copying it.
* Key serialization: bigint -> 8-byte big-endian; text -> UTF-8 bytes.

Implementation mirrors functions/dockey.py: a plain-Python scalar model
(the test oracle) plus a vectorized numpy batch path — rows are bucketed
by byte length, each bucket packs into an (n, L) uint8 matrix, and the
block loop runs once per 16-byte block VECTORIZED ACROSS ROWS (uint64
wraparound is native C behavior). The Arrow boundary is the only Python
touchpoint; there is no per-row loop in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_M64 = (1 << 64) - 1


def _rotl(v: int, r: int) -> int:
    return ((v << r) | (v >> (64 - r))) & _M64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_token_py(data: bytes) -> int:
    """Scalar reference model: h1 of MurmurHash3_x64_128 (seed 0) with
    Cassandra's signed-tail composition, normalized like the partitioner."""
    length = len(data)
    nblocks = length // 16
    h1 = h2 = 0

    for b in range(nblocks):
        k1 = int.from_bytes(data[b * 16 : b * 16 + 8], "little")
        k2 = int.from_bytes(data[b * 16 + 8 : b * 16 + 16], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64

    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    # Cassandra's switch sign-extends each tail byte before the shift
    for i in range(len(tail) - 1, 7, -1):  # bytes 8..14 -> k2
        sb = tail[i] - 256 if tail[i] >= 128 else tail[i]
        k2 ^= (sb << (8 * (i - 8))) & _M64
        k2 &= _M64
    for i in range(min(len(tail), 8) - 1, -1, -1):  # bytes 0..7 -> k1
        sb = tail[i] - 256 if tail[i] >= 128 else tail[i]
        k1 ^= (sb << (8 * i)) & _M64
    if len(tail) > 8:
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    if len(tail) > 0:
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M64

    signed = h1 - (1 << 64) if h1 >= (1 << 63) else h1
    return (1 << 63) - 1 if signed == -(1 << 63) else signed


def _np_rotl(v: np.ndarray, r: int) -> np.ndarray:
    return (v << np.uint64(r)) | (v >> np.uint64(64 - r))


def _np_fmix(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> np.uint64(33))
    return k


def _murmur3_batch(rows: list[bytes | None]) -> np.ndarray:
    """Vectorized batch: bucket rows by byte length; per bucket, one
    (n, L) uint8 matrix, block loop vectorized across the n rows."""
    out = np.zeros(len(rows), dtype=np.int64)
    lens = np.array([-1 if r is None else len(r) for r in rows], dtype=np.int64)
    with np.errstate(over="ignore"):
        for L in np.unique(lens):
            if L < 0:
                continue
            idx = np.nonzero(lens == L)[0]
            L = int(L)
            mat = (
                np.frombuffer(b"".join(rows[i] for i in idx), dtype=np.uint8)
                .reshape(len(idx), L)
                if L
                else np.zeros((len(idx), 0), dtype=np.uint8)
            )
            h1 = np.zeros(len(idx), dtype=np.uint64)
            h2 = np.zeros(len(idx), dtype=np.uint64)
            nblocks = L // 16
            if nblocks:
                blocks = mat[:, : nblocks * 16].reshape(len(idx), nblocks, 2, 8)
                # unsigned little-endian composition for full blocks
                ks = blocks.astype(np.uint64) @ (
                    np.uint64(1) << (np.arange(8, dtype=np.uint64) * np.uint64(8))
                )
                for b in range(nblocks):
                    k1 = ks[:, b, 0] * np.uint64(_C1)
                    k1 = _np_rotl(k1, 31) * np.uint64(_C2)
                    h1 = h1 ^ k1
                    h1 = _np_rotl(h1, 27) + h2
                    h1 = h1 * np.uint64(5) + np.uint64(0x52DCE729)
                    k2 = ks[:, b, 1] * np.uint64(_C2)
                    k2 = _np_rotl(k2, 33) * np.uint64(_C1)
                    h2 = h2 ^ k2
                    h2 = _np_rotl(h2, 31) + h1
                    h2 = h2 * np.uint64(5) + np.uint64(0x38495AB5)
            taillen = L % 16
            if taillen:
                tail = mat[:, nblocks * 16 :]
                # sign-extend each byte to int64, shift, XOR (Cassandra Java)
                stail = tail.astype(np.int8).astype(np.int64)
                k1 = np.zeros(len(idx), dtype=np.uint64)
                k2 = np.zeros(len(idx), dtype=np.uint64)
                for i in range(min(taillen, 8)):
                    k1 = k1 ^ (stail[:, i].view(np.uint64) << np.uint64(8 * i))
                for i in range(8, taillen):
                    k2 = k2 ^ (stail[:, i].view(np.uint64) << np.uint64(8 * (i - 8)))
                if taillen > 8:
                    k2 = k2 * np.uint64(_C2)
                    k2 = _np_rotl(k2, 33) * np.uint64(_C1)
                    h2 = h2 ^ k2
                k1 = k1 * np.uint64(_C1)
                k1 = _np_rotl(k1, 31) * np.uint64(_C2)
                h1 = h1 ^ k1
            h1 = h1 ^ np.uint64(L)
            h2 = h2 ^ np.uint64(L)
            h1 = h1 + h2
            h2 = h2 + h1
            h1 = _np_fmix(h1)
            h2 = _np_fmix(h2)
            h1 = h1 + h2
            signed = h1.view(np.int64).copy()
            signed[signed == np.iinfo(np.int64).min] = np.iinfo(np.int64).max
            out[idx] = signed
    return out


@F.pandas_udf(T.LongType())
def _token_bytes_udf(data: pd.Series) -> pd.Series:
    rows = [None if v is None else bytes(v) for v in data]
    return pd.Series(_murmur3_batch(rows))


def cassandra_token(col: Column, dtype: T.DataType) -> Column:
    """Column expr: Murmur3Partitioner token of a partition-key column.

    Serialization matches the CQL binary protocol: integral types as
    big-endian fixed width (bigint 8 / int 4), text as UTF-8 bytes —
    then the vectorized murmur3 UDF. NULL keys yield NULL."""
    if isinstance(dtype, (T.LongType,)):
        data = F.unhex(F.lpad(F.hex(col), 16, "0"))
    elif isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
        data = F.unhex(F.lpad(F.hex(col.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))), 8, "0"))
    elif isinstance(dtype, T.StringType):
        data = F.encode(col, "UTF-8")
    elif isinstance(dtype, T.BinaryType):
        data = col
    else:
        raise TypeError(f"unsupported partition-key type for token(): {dtype}")
    return F.when(col.isNotNull(), _token_bytes_udf(data))

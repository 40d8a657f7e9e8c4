"""Surrogate document-key hash (sdbm-65599, signed-64 wraparound).

Semantics match the reference's ``getStringKey`` (``Query.java:303-316``):

    hash = c + (hash << 6) + (hash << 16) - hash   # = hash*65599 + c, per
                                                   # UTF-16 code unit
    if hash <= 0: hash = ~hash + 1                 # two's-complement negate
    null string -> 0; empty string -> hashBase unchanged

Verified vectors (SURVEY §1.4, JDK-executed):
    ('http://example.com/a', base 0) -> 4447361795561394557
    ('', base 5)                     -> 5
    ('a', base 0)                    -> 97
    ('url1 42', base 7)              -> 1238248254775611051

Implementation: the recurrence h_{i+1} = 65599*h_i + c_i (mod 2^64) has the
closed form h_n = base*65599^n + Σ c_i*65599^(n-1-i), so a whole string is
one uint64 dot product against a precomputed powers table — fully
vectorized inside the Arrow batch, no per-char Python loop. ``F.hash`` /
``F.xxhash64`` are NOT substitutes: ids must bit-match the reference.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MULT = 65599
_POW_CACHE_LEN = 4096
_MASK64 = (1 << 64) - 1


def _powers(n: int) -> np.ndarray:
    """[65599^0, 65599^1, ..., 65599^n] mod 2^64, as uint64."""
    acc, vals = 1, []
    for _ in range(n + 1):
        vals.append(acc)
        acc = (acc * _MULT) & _MASK64
    return np.array(vals, dtype=np.uint64)


_POWS = _powers(_POW_CACHE_LEN)


def utf16_units(s: str) -> Iterator[int]:
    """Java iterates chars = UTF-16 code units; non-BMP chars contribute two
    surrogate units (SURVEY §1.4 caveat)."""
    for ch in s:
        o = ord(ch)
        if o < 0x10000:
            yield o
        else:
            o -= 0x10000
            yield 0xD800 + (o >> 10)
            yield 0xDC00 + (o & 0x3FF)


def sdbm_key_py(hash_base: int, s: str | None) -> int:
    """Plain-Python reference model (test oracle; bit-matches the JVM)."""
    if s is None:
        return 0
    mod = 1 << 64
    h = hash_base % mod
    for c in utf16_units(s):
        h = (c + (h << 6) + (h << 16) - h) % mod
    signed = h - mod if h >= (1 << 63) else h
    if signed > 0:
        return signed
    neg = (mod - h) % mod  # wrapping two's-complement negation
    return neg - mod if neg >= (1 << 63) else neg


def _sdbm_batch(bases: np.ndarray, texts: pd.Series) -> np.ndarray:
    """Fully vectorized: group rows by UTF-16 length, pack each group into
    an (n_rows, L) uint16 matrix, and compute every hash in the group as
    one uint64 matrix-vector product against the reversed powers table
    (C unsigned arithmetic wraps mod 2^64 natively). No per-row Python
    loop — the Arrow batch is ~matmul-bound."""
    global _POWS
    out = np.zeros(len(texts), dtype=np.uint64)
    vals = texts.to_numpy(dtype=object)
    enc: list[bytes | None] = [None] * len(vals)
    lens = np.full(len(vals), -1, dtype=np.int64)
    for i, s in enumerate(vals):
        if s is None or (isinstance(s, float) and np.isnan(s)):
            continue  # getStringKey(null) -> 0, ignoring base
        e = str(s).encode("utf-16-le")
        enc[i] = e
        lens[i] = len(e) >> 1
    max_len = int(lens.max()) if len(lens) else 0
    if max_len >= len(_POWS):
        _POWS = _powers(max(max_len, 2 * len(_POWS)))
    with np.errstate(over="ignore"):
        for L in np.unique(lens):
            if L < 0:
                continue
            idx = np.nonzero(lens == L)[0]
            h = bases[idx] * _POWS[L]
            if L:
                units = np.frombuffer(
                    b"".join(enc[i] for i in idx), dtype="<u2"
                ).reshape(len(idx), L)
                h = h + units.astype(np.uint64) @ _POWS[L - 1 :: -1]
            out[idx] = h
        signed = out.view(np.int64)
        nonpos = signed <= 0
        out[nonpos] = (~out[nonpos]) + np.uint64(1)
    return out.view(np.int64)


@F.pandas_udf(T.LongType())
def sdbm_key_udf(base: pd.Series, text: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) doc-key hash: (hashBase, keyString) -> id."""
    bases = base.fillna(0).to_numpy(dtype=np.int64).view(np.uint64)
    return pd.Series(_sdbm_batch(bases, text))

"""CQL built-in compatibility functions (SURVEY §2B B9/B11/B12).

The reference forwards CQL verbatim to a Cassandra 2.x server
(``Query.java:151-153``), so its accepted surface includes the server's
scalar built-ins. This module re-exposes them as Column expressions:

* ``token_murmur_like`` — B9: partitioner token. Documented divergence:
  Cassandra's Murmur3Partitioner token (murmur3_128 high bits) is not
  reproducible with Spark built-ins; we expose a deterministic 64-bit
  token with the same *operational* properties (stable, uniform,
  range-partitionable). Byte-parity with a live cluster is out of scope
  (SURVEY §2B: "not needed for parity").
* timeuuid family — B11: ``date_of`` / ``unix_timestamp_of`` /
  ``min_timeuuid`` / ``max_timeuuid``. Version-1 UUID layout per RFC 4122:
  60-bit count of 100ns intervals since 1582-10-15, split
  time_low(32) / time_mid(16) / time_hi(12). min/max use Cassandra's
  published MIN/MAX clock-seq-and-node constants (0x8080808080808080 /
  0x7f7f7f7f7f7f7f7f), so ``SELECT ... WHERE t > minTimeuuid(..)``
  windows behave identically.
* blob casts — B12: ``blob_as_bigint`` etc. reinterpret bytes,
  big-endian, exactly like Cassandra's ``blobAsX``/``XAsBlob``.

All pure Column exprs (conv/hex/unhex/concat_ws) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 100ns intervals between 1582-10-15 (gregorian reform) and 1970-01-01
GREGORIAN_OFFSET_100NS = 122192928000000000

MIN_CLOCK_SEQ_AND_NODE = "8080-808080808080"  # Cassandra UUIDGen constants
MAX_CLOCK_SEQ_AND_NODE = "7f7f-7f7f7f7f7f7f"


def token_murmur_like(*cols: Column) -> Column:
    """Deterministic 64-bit partitioner token over the partition key."""
    return F.xxhash64(*cols)


def _timeuuid_ts100(uuid_col: Column) -> Column:
    """60-bit v1 timestamp (100ns units since gregorian epoch) from a
    canonical uuid string ``tttttttt-tttt-1ttt-cccc-nnnnnnnnnnnn``."""
    time_low = F.conv(F.substring(uuid_col, 1, 8), 16, 10).cast("long")
    time_mid = F.conv(F.substring(uuid_col, 10, 4), 16, 10).cast("long")
    time_hi = F.conv(F.substring(uuid_col, 16, 3), 16, 10).cast("long")  # skip version nibble
    return (
        F.shiftleft(time_hi, 48) + F.shiftleft(time_mid, 32) + time_low
    )


def unix_timestamp_of(uuid_col: Column) -> Column:
    """CQL ``unixTimestampOf(timeuuid)`` — epoch milliseconds (long).

    Exact integer division: the ~1.7e16 numerator exceeds 2^53, so a
    plain ``/`` would round odd remainders across the ms boundary (e.g. a
    maxTimeuuid with remainder 9999 would come back 1 ms late). The
    remainder is subtracted first, making the double division exact."""
    ts100 = _timeuuid_ts100(uuid_col) - F.lit(GREGORIAN_OFFSET_100NS)
    return ((ts100 - F.pmod(ts100, F.lit(10000))) / 10000).cast("long")


def date_of(uuid_col: Column) -> Column:
    """CQL ``dateOf(timeuuid)`` — the embedded time as a timestamp."""
    return F.timestamp_millis(unix_timestamp_of(uuid_col))


def _hex_n(col: Column, n: int) -> Column:
    return F.lpad(F.lower(F.hex(col)), n, "0")


def _timeuuid_from_ms(ts_ms: Column, clock_node: str, offset_100ns: int = 0) -> Column:
    ts100 = (ts_ms.cast("long") * 10000) + F.lit(GREGORIAN_OFFSET_100NS + offset_100ns)
    time_low = ts100.bitwiseAND(F.lit(0xFFFFFFFF))
    time_mid = F.shiftrightunsigned(ts100, 32).bitwiseAND(F.lit(0xFFFF))
    time_hi = F.shiftrightunsigned(ts100, 48).bitwiseAND(F.lit(0x0FFF))
    return F.concat_ws(
        "-",
        _hex_n(time_low, 8),
        _hex_n(time_mid, 4),
        F.concat(F.lit("1"), _hex_n(time_hi, 3)),
        F.lit(clock_node),
    )


def min_timeuuid(ts: Column) -> Column:
    """CQL ``minTimeuuid(ts)`` — smallest v1 uuid for that millisecond."""
    return _timeuuid_from_ms(F.unix_millis(ts), MIN_CLOCK_SEQ_AND_NODE)


def max_timeuuid(ts: Column) -> Column:
    """CQL ``maxTimeuuid(ts)`` — largest v1 uuid for that millisecond:
    embedded 100ns count is (ms+1)*10000 - 1 (Cassandra UUIDGen), i.e.
    remainder 9999 within the millisecond, NOT the same count as
    min_timeuuid — otherwise `t <= maxTimeuuid(x)` would exclude nearly
    every real timeuuid generated during millisecond x."""
    return _timeuuid_from_ms(F.unix_millis(ts), MAX_CLOCK_SEQ_AND_NODE, offset_100ns=9999)


# --- B12 blob casts (big-endian reinterpretation, like Cassandra) ----------


def blob_as_bigint(col: Column) -> Column:
    """8-byte blob → signed long. ``conv(..., 16, -10)`` renders the
    signed interpretation directly; a plain toBase-10 conv yields an
    UNSIGNED decimal string that errors (ANSI) or nulls on cast for any
    blob with the high bit set."""
    return F.conv(F.lpad(F.hex(col), 16, "0"), 16, -10).cast("long")


def blob_as_int(col: Column) -> Column:
    """4-byte blob → signed int (two's complement within 32 bits)."""
    u = F.conv(F.hex(col), 16, 10).cast("long")  # ≤ 2^32-1, fits long
    return (
        (F.pmod(u + F.lit(2147483648), F.lit(4294967296)) - F.lit(2147483648))
        .cast("int")
    )


def blob_as_text(col: Column) -> Column:
    return col.cast("string")  # utf-8 decode


def bigint_as_blob(col: Column) -> Column:
    return F.unhex(F.lpad(F.hex(col), 16, "0"))


def int_as_blob(col: Column) -> Column:
    return F.unhex(F.lpad(F.hex(col.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))), 8, "0"))


def text_as_blob(col: Column) -> Column:
    return F.encode(col, "UTF-8")


# --- B10 writetime()/ttl() emulation (cell-metadata pseudo-columns) --------
#
# Cassandra tracks (writetime µs, ttl s) per CELL; the reference surfaces
# them by delegation (``Query.java:151-153`` forwards any CQL, the server
# answers from cell metadata). Columnar formats carry no cell metadata, so
# the engine EMULATES them: ``attach_cell_metadata`` derives row-level
# sidecar columns from a designated last-write timestamp (and optional
# expiry), and ``writetime``/``ttl`` resolve a column's sidecar exactly like
# the CQL pseudo-columns. Documented divergence: the sidecars are per-ROW
# (one write time for all cells), which is what an append-only lake actually
# records; per-cell granularity would require a cell-versioned source.
# All pure Column exprs — pushdown/pruning unaffected.

WRITETIME_SUFFIX = "__writetime"
TTL_SUFFIX = "__ttl"

from pyspark.sql import DataFrame  # noqa: E402  (Column-only imports above)


def attach_cell_metadata(
    df: DataFrame,
    write_time: Column,
    ttl_expiry: Column | None = None,
    as_of: Column | None = None,
    cols: list[str] | None = None,
) -> DataFrame:
    """Add ``<col>__writetime`` (bigint µs since epoch, like CQL) and —
    when ``ttl_expiry`` is given — ``<col>__ttl`` (int seconds remaining at
    ``as_of``, NULL once expired ≙ CQL's 'no live TTL') for each named
    column. ``as_of`` must be an explicit timestamp Column so results are
    deterministic (no hidden now())."""
    wt_us = F.unix_micros(write_time)
    ttl_s = None
    if ttl_expiry is not None:
        if as_of is None:
            raise ValueError("ttl emulation requires an explicit as_of timestamp")
        # exact integer division via remainder subtraction (same pattern as
        # unix_timestamp_of): the multiple-of-1e6 numerator stays < 2^53,
        # so the double division is exact
        diff_us = F.unix_micros(ttl_expiry) - F.unix_micros(as_of)
        whole_s = ((diff_us - F.pmod(diff_us, F.lit(1000000))) / 1000000).cast("long")
        ttl_s = F.when(diff_us > 0, whole_s)
    for c in cols or [f.name for f in df.schema.fields]:
        df = df.withColumn(c + WRITETIME_SUFFIX, wt_us)
        if ttl_s is not None:
            df = df.withColumn(c + TTL_SUFFIX, ttl_s)
    return df


def writetime(df: DataFrame, col_name: str) -> Column:
    """CQL ``writetime(c)`` — µs since epoch of the cell's last write."""
    sidecar = col_name + WRITETIME_SUFFIX
    if sidecar not in df.columns:
        raise ValueError(
            f"no writetime metadata for {col_name!r}; call attach_cell_metadata first"
        )
    return F.col(sidecar)


def ttl(df: DataFrame, col_name: str) -> Column:
    """CQL ``ttl(c)`` — seconds until the cell expires, NULL if expired/none."""
    sidecar = col_name + TTL_SUFFIX
    if sidecar not in df.columns:
        raise ValueError(
            f"no ttl metadata for {col_name!r}; call attach_cell_metadata first"
        )
    return F.col(sidecar)

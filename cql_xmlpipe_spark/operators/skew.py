"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting (on in this engine's session) handles most
skew at runtime; explicit salting remains necessary for (a) skewed
AGGREGATIONS (AQE does not split a hot groupBy key) and (b) engines/
paths where AQE is off (streaming stateful ops).

``salted_agg`` implements the canonical two-phase aggregate: group by
(key, salt) first — spreading one hot key over ``n_salts`` reducers —
then re-aggregate by key. Works for any algebraic aggregate set the
caller expresses in partial/final form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): derived from a row hash
    plus a per-partition ordinal, not rand() — reruns of the same input
    partitioning produce identical salts (reproducible results), while
    the ordinal guarantees spread even when a hot key's rows are
    bytewise-identical (the exact scenario salting exists for: a value
    hash alone would send every duplicate to one reducer)."""
    ordinal = F.monotonically_increasing_id()
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(ordinal, *[F.col(c) for c in df.columns]), F.lit(n_salts)),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: name -> aggregate over the raw rows (phase 1, keyed
    by keys+salt). ``final_aggs``: name -> aggregate over the phase-1
    columns (phase 2, keyed by keys). E.g. count: partial
    ``count(1) AS c`` then final ``sum(c) AS c``.
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(*[c.alias(n) for n, c in final_aggs.items()])

"""Gap-based sessionization, plain and skew-hardened.

The plain form is the classic lag/cumsum device: one window per user
ordered by time — new session where the gap to the previous event
exceeds ``gap_us``, session ordinal by running sum, then a grouped
aggregate. Correct and optimal until one user holds a planet's worth of
events: a window partition is processed by ONE task, so a single hot
user (the ``make_scale_data.py --skew`` shape: ~10% of all events on
one key) serializes the whole stage behind one straggler and spills its
partition.

``sessionize_bucketed`` is the pre-bucket + stitch plan SCALE.md
prescribed for that hazard:

1. **Pre-bucket**: every event gets ``bucket = floor(us / bucket_us)``
   (default one day). The window key becomes (user, bucket) — the hot
   user's events split across as many tasks as days touched, bounding
   any task's partition at one user-day.
2. **Local sessionize**: the identical lag/cumsum device within each
   bucket, collapsed to per-bucket session summaries
   (n_events, start, end). Volume drops from events to local sessions.
3. **Stitch**: a session that crosses a bucket cut appears as a summary
   ending at the cut's last event and another starting at the next —
   adjacent in time by construction (buckets partition the timeline),
   so a second lag/cumsum over SUMMARIES per user (order by start;
   chain-break where ``start − lag(end) > gap_us``) reconstructs the
   transitive closure exactly, and its running sum renumbers sessions
   in the same first-event order the plain form uses.

The stitch window is still per-user, but it processes session SUMMARIES,
not events: the 10⁹-event hot user contributes at most
(#buckets touched + #true sessions) rows — the skew is collapsed before
the per-user key is ever shuffled. Equality with the plain form is
pinned by pytest on boundary-adversarial corpora and by the
``events_sessionize_bucketed`` gate under the same DuckDB oracle as
``events_sessionize``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

#: 10-minute inactivity gap, microseconds — the events_sessionize contract
DEFAULT_GAP_US = 600_000_000

#: one-day pre-buckets: long enough that real sessions rarely straddle a
#: cut (stitch volume ~ sessions), short enough to split a hot user's
#: year of events across ~365 tasks
DEFAULT_BUCKET_US = 86_400_000_000


def _sessionize_within(df: DataFrame, part_cols: list[str], gap_us: int) -> DataFrame:
    """The lag/cumsum sessionization device over ``part_cols`` windows:
    tags each event with its session ordinal within the partition."""
    w = W.partitionBy(*part_cols).orderBy("us", "event_id")
    new_s = F.when(
        (F.col("us") - F.lag("us").over(w) > gap_us)
        | F.lag("us").over(w).isNull(),
        1,
    ).otherwise(0)
    w2 = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn("_new_s", new_s).withColumn(
        "_sid", F.sum("_new_s").over(w2)
    )


def sessionize(events: DataFrame, gap_us: int = DEFAULT_GAP_US) -> DataFrame:
    """Plain per-user sessionization → (user_id, session_id, n_events,
    session_start_us, session_end_us). One window exchange on user_id;
    the right plan whenever no single user dominates a partition."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    t = _sessionize_within(
        events.select("user_id", "event_id", us.alias("us")), ["user_id"], gap_us
    )
    return t.groupBy("user_id", F.col("_sid").alias("session_id")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("session_start_us"),
        F.max("us").alias("session_end_us"),
    )


def sessionize_bucketed(
    events: DataFrame,
    gap_us: int = DEFAULT_GAP_US,
    bucket_us: int = DEFAULT_BUCKET_US,
) -> DataFrame:
    """Skew-hardened sessionization: identical output to
    :func:`sessionize` (same columns, same session_id ordinals), with
    the event-volume window keyed on (user, time-bucket) so a hot user
    cannot serialize one task — see the module docstring for the
    pre-bucket → local-sessionize → stitch argument."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = events.select(
        "user_id",
        "event_id",
        us.alias("us"),
        F.floor(us / F.lit(bucket_us)).alias("_bkt"),
    )
    local = (
        _sessionize_within(b, ["user_id", "_bkt"], gap_us)
        .groupBy("user_id", "_bkt", "_sid")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min("us").alias("_st"),
            F.max("us").alias("_en"),
        )
    )
    # stitch: local sessions of one user are time-disjoint and ordered
    # (buckets partition the timeline), so chain-merge on start-vs-
    # previous-end is the exact transitive closure
    w = W.partitionBy("user_id").orderBy("_st", "_bkt", "_sid")
    new_c = F.when(
        (F.col("_st") - F.lag("_en").over(w) > gap_us)
        | F.lag("_en").over(w).isNull(),
        1,
    ).otherwise(0)
    w2 = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    chained = local.withColumn("_new_c", new_c).withColumn(
        "session_id", F.sum("_new_c").over(w2)
    )
    return chained.groupBy("user_id", "session_id").agg(
        F.sum("_n").alias("n_events"),
        F.min("_st").alias("session_start_us"),
        F.max("_en").alias("session_end_us"),
    )

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


def bucketed_prev(
    events: DataFrame,
    value_col: str,
    bucket_us: int = DEFAULT_BUCKET_US,
) -> DataFrame:
    """Skew-hardened ``LAG(value) OVER (PARTITION BY user ORDER BY us,
    event_id)`` — the :func:`sessionize_bucketed` pre-bucket + stitch
    device generalized to the lag shape (r13 verdict task: the
    transition/sequence gates window on the raw user key, so one hot
    user's events sort in ONE task).

    Input needs (user_id, event_id, us, ``value_col``); output adds
    ``_prev`` = the previous event's value in the per-user total order.

    1. the event-volume window keys on (user, ``bucket_us`` bucket) —
       a hot user splits across as many tasks as buckets touched;
    2. each bucket's LAST value is a per-(user, bucket) summary
       aggregate (map-side combining, no event sort);
    3. a lag over the SUMMARIES per user carries that value to the next
       occupied bucket, where it becomes the bucket-first row's prev —
       buckets partition the timeline, so the previous occupied
       bucket's last event IS the global previous event.

    First-row detection uses the order column (``us`` is never null),
    not the value, so a legitimately-NULL value mid-stream is never
    overwritten by the carry."""
    b = events.withColumn("_bkt", F.floor(F.col("us") / F.lit(bucket_us)))
    w_loc = W.partitionBy("user_id", "_bkt").orderBy("us", "event_id")
    t = b.withColumn("_prev_loc", F.lag(value_col).over(w_loc)).withColumn(
        "_loc_first", F.lag("us").over(w_loc).isNull()
    )
    lasts = b.groupBy("user_id", "_bkt").agg(
        F.max_by(value_col, F.struct("us", "event_id")).alias("_last_v")
    )
    w_b = W.partitionBy("user_id").orderBy("_bkt")
    carry = lasts.select(
        "user_id", "_bkt", F.lag("_last_v").over(w_b).alias("_carry")
    )
    return (
        t.join(carry, ["user_id", "_bkt"], "left")
        .withColumn(
            "_prev",
            F.when(F.col("_loc_first"), F.col("_carry")).otherwise(
                F.col("_prev_loc")
            ),
        )
        .drop("_prev_loc", "_loc_first", "_carry")
    )


def bucketed_row_number(
    events: DataFrame, bucket_us: int = DEFAULT_BUCKET_US
) -> DataFrame:
    """Skew-hardened per-user ``ROW_NUMBER() - 1`` (column ``rn``) and
    per-user total count (column ``_n_user``) over the (us, event_id)
    order — the pre-bucket + stitch device at the rank shape.

    Local rank within (user, bucket) + the running count of earlier
    buckets (a window over per-bucket COUNT summaries, ~#buckets rows
    per user) reconstructs the global ordinal exactly: buckets
    partition the timeline, so every earlier event is in an earlier-or-
    equal bucket."""
    b = events.withColumn("_bkt", F.floor(F.col("us") / F.lit(bucket_us)))
    w_loc = W.partitionBy("user_id", "_bkt").orderBy("us", "event_id")
    t = b.withColumn("_rn_loc", F.row_number().over(w_loc))
    counts = b.groupBy("user_id", "_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = (
        W.partitionBy("user_id")
        .orderBy("_bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = counts.select(
        "user_id",
        "_bkt",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(W.partitionBy("user_id")).alias("_n_user"),
    )
    return (
        t.join(offs, ["user_id", "_bkt"])
        .withColumn("rn", F.col("_rn_loc") - 1 + F.col("_off"))
        .drop("_rn_loc", "_off")
    )

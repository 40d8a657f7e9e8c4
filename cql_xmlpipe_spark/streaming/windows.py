"""Event-time windowed aggregation with watermarks (SURVEY §2C streaming).

Each operator takes the *streaming* events DataFrame and returns a
streaming aggregate; tests run them with ``trigger(availableNow=True)``
and assert exact equality against the batch twins in
``plans/queries.py`` (``events_tumbling_window`` / ``events_sessionize``).

Watermark semantics: state for a window is dropped once the event-time
watermark passes its end — bounded state at unbounded input, which is the
100 TB-stream requirement. The watermark delay below is the lateness SLA,
not a performance knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(30,8)"


def _dsum(col) -> F.Column:
    """Order-independent double sum (exact decimal accumulation) — matches
    the batch twins so stream-vs-batch equality is bit-exact."""
    return F.sum(F.col(col).cast(DEC)).cast("double")


def tumbling_window_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling event-time window per event_type: count + exact value sum."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum("value").alias("sum_value"))
        .select(
            "event_type",
            F.col("w.start").cast("long").alias("bucket_start"),
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding (overlapping) event-time windows per event_type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type", F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum("value").alias("sum_value"))
        .select(
            "event_type",
            F.col("w.start").cast("long").alias("bucket_start"),
            F.col("w.end").cast("long").alias("bucket_end"),
            "n_events",
            "sum_value",
        )
    )


def session_window_stats(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows per user: sessions close after `gap` of inactivity.

    Same sessionization semantics as the batch ``events_sessionize`` twin
    (lag/cumsum formulation) — the streaming native form keeps only open
    sessions in state.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )

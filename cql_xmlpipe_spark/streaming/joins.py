"""Stream-stream joins (Structured Streaming's hardest stateful op).

An inner join of two event streams on key + a time interval: each side
buffers rows in state only until the watermark proves no future match can
arrive — the time-range predicate is what makes state BOUNDED. Without
it, a stream-stream join would buffer both streams forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchases_with_recent_clicks(
    events: DataFrame,
    lookback: str = "15 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Join each purchase to the same user's clicks within ``lookback``
    before it. Works on a streaming OR batch events frame — identical
    semantics (tests assert stream == batch)."""
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    if p.isStreaming:
        p = p.withWatermark("p_ts", watermark)
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return p.join(c, cond, "inner").select(
        "user_id",
        "purchase_id",
        F.unix_micros("p_ts").alias("p_ts_us"),
        "purchase_value",
        "click_id",
        F.unix_micros("c_ts").alias("c_ts_us"),
    )

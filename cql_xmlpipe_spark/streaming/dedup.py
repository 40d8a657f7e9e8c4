"""Streaming deduplication — exactly-once event streams from at-least-
once sources (the streaming sibling of operators/dedup.py).

``dropDuplicatesWithinWatermark`` keeps one row per key and expires its
key state once the event-time watermark passes — bounded state at
unbounded input, which unwatermarked ``dropDuplicates`` cannot give on a
stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate events by key within the watermark horizon."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )

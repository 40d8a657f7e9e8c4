"""Structured Streaming coverage: every streaming operator replays the
events table with ``trigger(availableNow=True)`` and must agree exactly
with its batch twin (same engine, same data ⇒ equality is exact, not
approximate)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from cql_xmlpipe_spark.operators.xmlpipe import xml_documents
from cql_xmlpipe_spark.plans import QUERIES
from cql_xmlpipe_spark.sources.registry import load_table
from cql_xmlpipe_spark.streaming import (
    running_user_stats,
    session_window_stats,
    sliding_window_counts,
    stream_events,
    tumbling_window_counts,
    write_xmlpipe_stream,
)

SF = "/root/testdata/sf0.001"


def _run_to_memory(df, name: str, mode: str, spark):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark):
    got = _run_to_memory(
        tumbling_window_counts(stream_events(spark, SF)), "t_tumble", "update", spark
    )
    want = QUERIES["events_tumbling_window"](spark, SF)
    cols = ["event_type", "bucket_start", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_sliding_stream_equals_batch(spark):
    got = _run_to_memory(
        sliding_window_counts(stream_events(spark, SF)), "t_slide", "update", spark
    ).drop("bucket_end")
    want = QUERIES["events_sliding_window"](spark, SF)
    cols = ["event_type", "bucket_start", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_window_stream_equals_batch(spark):
    # session-window aggs reject update mode; complete emits every session
    # regardless of watermark, which is exactly what batch-equality needs
    got = _run_to_memory(
        session_window_stats(stream_events(spark, SF), gap="10 minutes"),
        "t_session",
        "complete",
        spark,
    )
    want = QUERIES["events_sessionize"](spark, SF)
    # session_window end = last event + gap; the batch twin records the last
    # event itself — align by subtracting the gap.
    gap_us = 10 * 60 * 1_000_000
    got_rows = sorted(
        (r["user_id"], r["session_start_us"], r["session_end_us"] - gap_us, r["n_events"])
        for r in got.collect()
    )
    want_rows = sorted(
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in want.collect()
    )
    assert got_rows == want_rows


def test_session_window_append_equals_batch_closed_sessions(spark):
    """The PRODUCTION append+watermark session plan: emitted rows must be
    exactly the batch sessions already CLOSED at the final watermark
    (end + gap strictly before max_ts(ms-floor) - 1 h — the empirically
    pinned Spark emission rule), the emission must be non-trivial on the
    gate corpus, and every emitted session's state was evictable (append
    never emits an open session)."""
    from cql_xmlpipe_spark.plans import QUERIES
    from cql_xmlpipe_spark.sources.registry import load_table

    got = QUERIES["streaming_session_window_append"](spark, SF)
    gap_us = 10 * 60 * 1_000_000
    max_us = load_table(spark, "events", SF).agg(
        F.max(F.unix_micros("ts"))
    ).collect()[0][0]
    wm_us = (max_us // 1000 - 3_600_000) * 1000
    want = QUERIES["events_sessionize"](spark, SF).filter(
        F.col("session_end_us") + gap_us < wm_us
    )
    cols = ["user_id", "session_start_us", "session_end_us", "n_events"]
    got_rows = _rows(got, cols)
    assert got_rows == _rows(want, cols)
    assert len(got_rows) > 0  # the gate actually exercises emission
    # and some sessions remain open/held: append < complete
    n_all = QUERIES["events_sessionize"](spark, SF).count()
    assert len(got_rows) < n_all


def test_stream_stream_interval_join_equals_batch(spark):
    from cql_xmlpipe_spark.streaming.joins import purchases_with_recent_clicks

    got = _run_to_memory(
        purchases_with_recent_clicks(stream_events(spark, SF)),
        "t_ssjoin",
        "append",
        spark,
    )
    want = QUERIES["interval_join_purchase_clicks"](spark, SF)
    cols = ["user_id", "purchase_id", "p_ts_us", "purchase_value", "click_id", "c_ts_us"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stateful_running_stats_equals_batch(spark):
    got = _run_to_memory(
        running_user_stats(stream_events(spark, SF)), "t_state", "update", spark
    )
    # one availableNow batch -> exactly one update per user
    e = load_table(spark, "events", SF)
    want = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        F.max(F.unix_micros("ts")).alias("last_seen_us"),
        F.size(F.collect_set("event_type")).alias("n_event_types"),
    )
    cols = ["user_id", "n_events", "sum_value_cents", "last_seen_us", "n_event_types"]
    assert _rows(got, cols) == _rows(want, cols)


def test_xmlpipe_stream_sink_equals_batch(spark, tmp_path):
    out = str(tmp_path / "xml_out")
    q = write_xmlpipe_stream(
        stream_events(spark, SF), ["event_id"], out, available_now=True
    )
    q.awaitTermination(120)
    lines: list[str] = []
    for part in glob.glob(f"{out}/batch=*/part-*"):
        with open(part, encoding="utf-8") as fh:
            lines.extend(ln for ln in fh.read().split("\n") if ln)
    batch_docs = xml_documents(load_table(spark, "events", SF), ["event_id"])
    want = sorted(r["xml"].lstrip("\n") for r in batch_docs.collect())
    assert sorted(lines) == want
    # envelope parts present for consumer-side concatenation
    assert glob.glob(f"{out}/_PROLOG") and glob.glob(f"{out}/_CLOSE")


def test_stateful_all_null_values_user_matches_sql_sum(spark, tmp_path):
    """SQL SUM over only NULLs is NULL, not 0 — a user whose every event
    has value=NULL must surface sum_value_cents as NULL so the stateful
    profile stays hash-identical to its aggregate oracle."""
    import os
    from datetime import datetime

    sf = str(tmp_path)
    t0 = datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "click", 2.5, "{}"),
        (1, t0, 1, "view", None, "{}"),
        (2, t0, 2, "click", None, "{}"),
        (3, t0, 2, "view", None, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    got = _run_to_memory(
        running_user_stats(stream_events(spark, sf)), "t_state_nulls", "update", spark
    )
    by_user = {r["user_id"]: r for r in got.collect()}
    assert by_user[1]["sum_value_cents"] == 250
    assert by_user[2]["sum_value_cents"] is None
    assert by_user[2]["n_events"] == 2

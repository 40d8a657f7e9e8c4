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

def test_streaming_incremental_probe_equals_batch(spark, tmp_path):
    """The foreachBatch ingest-dedup composition (VERDICT r10 #6): a
    multi-file staged replay of an increment, deduped per micro-batch
    against the standing corpus over the SHARED staged LSH geometry,
    must produce exactly the pairs one batch probe of the whole
    increment finds — pair fate depends only on the two texts, so the
    per-batch union composes exactly. Also pins the idempotent sink
    layout (one batch=<id> partition per micro-batch, overwrite mode)."""
    import os
    import time

    from pyspark.sql import types as T

    from cql_xmlpipe_spark.operators import dedup as DD
    from cql_xmlpipe_spark.streaming.dedup import incremental_probe_sink

    fam_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fam_b = "one two three four five six seven eight nine ten eleven"
    corpus = spark.createDataFrame(
        [(1, fam_a), (2, fam_a), (10, fam_b),
         (20, "an unrelated corpus document about something else entirely")],
        "doc_id long, text string",
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "inc_src"
    src.mkdir()
    batches = [
        [(100, fam_a), (101, "novel batch doc with fresh words")],
        [(102, fam_b), (103, fam_a)],
        [(104, fam_b + " twelve"), (105, "another novel one right here")],
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    now = time.time()
    for i, rows in enumerate(batches):
        f = str(src / f"part-{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            f,
        )
        os.utime(f, (now - 300 + 100 * i, now - 300 + 100 * i))

    out = str(tmp_path / "pairs_out")
    sink = incremental_probe_sink(corpus, out, threshold=0.35, k=3)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "probe_ckpt"))
        .start()
    )
    assert q.awaitTermination(300)

    got_df = spark.read.parquet(out)
    # one partition directory per micro-batch (maxFilesPerTrigger=1)
    assert sorted(r["batch"] for r in got_df.select("batch").distinct().collect()) == [0, 1, 2]
    got = _rows(got_df, ["inc_id", "corpus_id", "jaccard"])

    increment = spark.createDataFrame(
        [r for rows in batches for r in rows], schema
    )
    expected_df = DD.incremental_probe_pairs(corpus, increment, threshold=0.35, k=3)
    expected = _rows(expected_df, ["inc_id", "corpus_id", "jaccard"])
    DD.unpersist_intermediates(expected_df)
    assert got == expected
    # the planted cross pairs actually happened: the fam_a clones hit
    # both corpus members, fam_b docs hit doc 10
    assert {(100, 1), (100, 2), (103, 1), (102, 10)} <= {(a, b) for a, b, _ in got}


def test_streaming_roster_maintenance_equals_batch(spark, tmp_path):
    """The stateful roster-maintenance sink: after a 3-micro-batch
    staged replay, the LATEST roster snapshot equals the from-scratch
    rosters over corpus ∪ every batch (the streamed form of the
    iterated-ingest property), intermediate snapshots reflect their
    prefix of the stream, and a FULL REPLAY with a fresh checkpoint
    (at-least-once delivery) short-circuits on the committed snapshots
    and changes nothing."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from cql_xmlpipe_spark.operators import dedup as DD
    from cql_xmlpipe_spark.streaming.dedup import roster_maintenance_sink

    fam_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    new_fam = "first seen in batch one text with recurring tokens here"
    corpus = spark.createDataFrame(
        [(0, fam_a), (1, fam_a), (10, "unique corpus doc number ten words")],
        "doc_id long, text string",
    )
    batches = [
        [(100, new_fam), (101, fam_a)],
        [(200, new_fam)],
        [(300, "novel third batch doc nothing shared at all")],
    ]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    src = tmp_path / "roster_src"
    src.mkdir()
    now = time.time()
    for i, rows in enumerate(batches):
        f = str(src / f"part-{i}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            f,
        )
        os.utime(f, (now - 300 + 100 * i, now - 300 + 100 * i))

    state = str(tmp_path / "roster_state")
    sink = roster_maintenance_sink(corpus, state, threshold=0.35, k=3)

    def run(ckpt: str) -> None:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .start()
        )
        assert q.awaitTermination(300)

    run("roster_ckpt_1")
    import glob as _glob

    versions = sorted(
        int(p.rsplit("=", 1)[1]) for p in _glob.glob(f"{state}/rosters/v=*")
    )
    assert versions == [-1, 0, 1, 2]

    union = corpus
    for rows in batches:
        union = union.unionByName(spark.createDataFrame(rows, schema))
    scratch = DD.minhash_groups_collapsed(union, threshold=0.35, k=3)
    expected = _rows(scratch, ["cluster_id", "cluster_size"])
    DD.unpersist_intermediates(scratch)
    final = spark.read.parquet(f"{state}/rosters/v=2")
    assert _rows(final, ["cluster_id", "cluster_size"]) == expected
    members = {r["cluster_id"]: tuple(r["members"]) for r in final.collect()}
    assert members[0] == (0, 1, 101)      # batch-0 doc joined the corpus family
    assert members[100] == (100, 200)     # batch-1 doc joined the batch-0 family

    # the v=1 snapshot reflects exactly the first two batches
    mid = spark.read.parquet(f"{state}/rosters/v=1")
    mid_members = {r["cluster_id"]: tuple(r["members"]) for r in mid.collect()}
    assert mid_members[100] == (100, 200)

    # full at-least-once replay: fresh checkpoint reprocesses every file;
    # the committed snapshots short-circuit and the state is unchanged
    before = _rows(final, ["cluster_id", "cluster_size"])
    run("roster_ckpt_2")
    after_versions = sorted(
        int(p.rsplit("=", 1)[1]) for p in _glob.glob(f"{state}/rosters/v=*")
    )
    assert after_versions == [-1, 0, 1, 2]
    after = _rows(
        spark.read.parquet(f"{state}/rosters/v=2"), ["cluster_id", "cluster_size"]
    )
    assert after == before

    # restart with half-committed state: kill the last snapshot, build a
    # FRESH sink object (empty in-memory staged index) and replay — the
    # committed batches short-circuit, batch 2 re-runs after re-signing
    # the prior batches from their parquet, and v=2 is rebuilt identically
    import shutil

    shutil.rmtree(f"{state}/rosters/v=2")
    sink2 = roster_maintenance_sink(corpus, state, threshold=0.35, k=3)
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(sink2)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "roster_ckpt_3"))
        .start()
    )
    assert q.awaitTermination(300)
    rebuilt = _rows(
        spark.read.parquet(f"{state}/rosters/v=2"), ["cluster_id", "cluster_size"]
    )
    assert rebuilt == before


def test_streaming_incremental_probe_guard_fails_loudly(spark, tmp_path):
    """The documented guard semantics of the foreachBatch sink: a hot
    micro-batch over the cross-set cap FAILS the streaming query with
    the budget exception in the cause — never a silent skip that would
    publish an incomplete pair set."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql import types as T

    from cql_xmlpipe_spark.streaming.dedup import incremental_probe_sink

    hot = "the same hot document text shared across batch and corpus"
    corpus = spark.createDataFrame(
        [(i, hot) for i in range(200)], "doc_id long, text string"
    )
    src = tmp_path / "hot_src"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([10_000 + i for i in range(50)], pa.int64()),
                "text": pa.array([hot] * 50, pa.string()),
            }
        ),
        str(src / "part-0.parquet"),
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    sink = incremental_probe_sink(
        corpus, str(tmp_path / "hot_out"), threshold=0.5, k=3, max_pairs=1000
    )
    q = (
        spark.readStream.schema(schema)
        .parquet(str(src))
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "hot_ckpt"))
        .start()
    )
    with pytest.raises(StreamingQueryException) as ei:
        q.awaitTermination(300)
    assert "10,000" in str(ei.value)  # 50 x 200 cross pairs priced pre-flight


def test_session_window_append_late_data_semantics(spark, tmp_path):
    """Production lateness semantics of the append+watermark session plan,
    pinned on a MULTI-file staged replay (the gate corpus is one file →
    one micro-batch → nothing can ever be late; this drives the path the
    plans/queries.py docstring promises but the gate can't reach).

    Spark ≥3.4 runs TWO watermarks per batch (SPARK-42931): late-event
    FILTERING uses the previous batch's watermark; state EVICTION uses
    the current one. Both sides pinned here:

    * batch 1's 00:07 event for user 7 is older than the just-advanced
      09:00 watermark, but the late-filter watermark still lags at 0 —
      it MERGES into the open session (3 events, end 00:07+gap), which
      is then evicted+emitted by the 09:00 eviction watermark;
    * batch 2's 00:08 event faces a late-filter watermark of 09:00 —
      it is DROPPED (numRowsDroppedByWatermark) and, decisively, does
      NOT resurrect the already-emitted session as a spurious second
      append row (exactly-once emission per session)."""
    import datetime as dt
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    base = dt.datetime(2024, 1, 1)

    def us(minutes):
        return base + dt.timedelta(minutes=minutes)

    def write_file(path, rows):
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], pa.int64()),
                }
            ),
            path,
        )

    d = tmp_path / "stream_src"
    d.mkdir()
    f1, f2, f3 = (str(d / f"part-{i}.parquet") for i in (1, 2, 3))
    # f1: user 7 session (00:00, 00:05); sentinel 99 @ 10:00 -> wm 09:00
    write_file(f1, [(1, us(0), 7), (2, us(5), 7), (3, us(600), 99)])
    # f2: late-but-filter-lagged 00:07 for user 7 (merges); sentinel @
    # 20:00 -> wm 19:00 (also evicts+emits user 7's merged session)
    write_file(f2, [(4, us(7), 7), (5, us(1200), 99)])
    # f3: 00:08 for user 7 — now truly late (filter wm 09:00) -> dropped
    write_file(f3, [(6, us(8), 7)])
    now = time.time()  # file source orders by mtime
    for i, f in enumerate((f1, f2, f3)):
        os.utime(f, (now - 200 + 100 * i, now - 200 + 100 * i))

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    q = (
        session_window_stats(stream, gap="10 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_late_semantics")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.awaitTermination(300)
    dropped = [
        op["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    ]
    assert sum(dropped) == 1  # exactly the f3 row
    rows = sorted(
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.table("t_late_semantics").collect()
    )
    min_us = 60 * 1_000_000
    gap_us = 10 * min_us
    epoch = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    assert rows == [
        # user 7: ONE row — merged to 3 events by the lagged filter,
        # never resurrected by the truly-late f3 row
        (7, epoch, epoch + 7 * min_us + gap_us, 3),
        # sentinel's 10:00 singleton closed at the 19:00 eviction wm;
        # its 20:00 session stays open/held (no row)
        (99, epoch + 600 * min_us, epoch + 600 * min_us + gap_us, 1),
    ]

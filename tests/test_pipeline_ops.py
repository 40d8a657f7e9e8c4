"""Edge-case tests for the round-2 pipeline operators, run over crafted
parquet tables with the production schemas (the oracle harness covers the
bulk distribution; these pin the boundary behavior the synthetic corpus
never hits)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cql_xmlpipe_spark.plans.extensions import (
    doc_chunk_overlap,
    embedding_quantize_int8,
    events_gap_fill_hourly,
    quality_percentile_filter,
)


def _write_documents(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))


def test_chunking_boundary_lengths(spark, tmp_path):
    sf = str(tmp_path)
    docs = [
        (1, "a" * 400, "en", "s", 400),  # exactly one stride -> 1 chunk
        (2, "b" * 401, "en", "s", 401),  # one char past -> 2 chunks
        (3, "c" * 500, "en", "s", 500),  # full window but > stride -> 2 chunks
        (4, "d", "en", "s", 1),          # minimal doc -> 1 chunk of 1
    ]
    _write_documents(spark, sf, docs)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["start"], r["chunk_len"])
        for r in doc_chunk_overlap(spark, sf).collect()
    }
    assert got == {
        (1, 0): (1, 400),
        (2, 0): (1, 401), (2, 1): (401, 1),
        (3, 0): (1, 500), (3, 1): (401, 100),
        (4, 0): (1, 1),
    }


def test_quantize_rounding_and_sign(spark, tmp_path):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(0, [-1.0, 0.5, 0.25, -0.5], "x")],
        "vec_id long, embedding array<float>, label string",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))
    row = embedding_quantize_int8(spark, sf).collect()[0]
    # scale = 127/1; half-up via floor(x*s + 0.5): 63.5 -> 64, -63.5 -> -63
    assert row["q8"] == "-127,64,32,-63"
    assert row["max_abs"] == 1.0


def test_gap_fill_forward_fill_and_leading_null(spark, tmp_path):
    sf = str(tmp_path)
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        # user 1: events in hour 0 and hour 3 -> hours 1,2 are gaps
        (1, base, 1, "a", 10.0, "{}"),
        (2, base + dt.timedelta(hours=3), 1, "a", 30.0, "{}"),
        # user 2: single event -> single-row grid
        (3, base, 2, "a", 7.0, "{}"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    got = {
        (r["user_id"], r["bucket_start"]): (r["n_events"], r["filled_avg"])
        for r in events_gap_fill_hourly(spark, sf).collect()
    }
    h0 = int(base.replace(minute=0, tzinfo=dt.timezone.utc).timestamp())
    assert got[(1, h0)] == (1, 10.0)
    assert got[(1, h0 + 3600)] == (0, 10.0)   # gap carries hour-0 average
    assert got[(1, h0 + 7200)] == (0, 10.0)
    assert got[(1, h0 + 10800)] == (1, 30.0)
    assert got[(2, h0)] == (1, 7.0)
    assert len(got) == 5


def test_percentile_filter_keeps_upper_deciles(spark, tmp_path):
    sf = str(tmp_path)
    docs = [
        (i, "w " * (i + 1), "en", "s", 2 * (i + 1)) for i in range(10)
    ]  # token counts 1..10 -> percent_rank 0, 1/9, ..., 1
    _write_documents(spark, sf, docs)
    kept = {r["doc_id"] for r in quality_percentile_filter(spark, sf).collect()}
    assert kept == set(range(1, 10))  # only the pr=0 doc (doc_id 0) drops


def test_dup_span_removal_keep_first_semantics(spark, tmp_path):
    """Keep-first substring dedup on a hand-built corpus: the globally
    first occurrence (smallest (doc_id, pos)) of a repeated passage
    survives, later occurrences are cut, unique text is untouched, and
    a doc repeating a passage internally keeps only its first copy."""
    from cql_xmlpipe_spark.plans.extensions import text_dup_span_removal

    passage = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    unique = "entirely original words " + " ".join(f"u{i}" for i in range(8))
    inner = " ".join(f"m{i}" for i in range(8))  # 8 tokens, repeated in doc 4
    docs = [
        (1, passage + " plus a unique tail here also", "en", "s", 0),
        (2, passage, "en", "s", 0),                       # full later copy -> all cut
        (3, unique, "en", "s", 0),                        # untouched
        (4, inner + " " + inner, "en", "s", 0),           # within-doc repeat
    ]
    _write_documents(spark, str(tmp_path), docs)
    got = {r["doc_id"]: r for r in text_dup_span_removal(spark, str(tmp_path)).collect()}

    # doc 1 is the first occurrence: nothing cut
    assert got[1]["n_cut_tokens"] == 0
    assert got[1]["text_deduped"].startswith("the quick brown fox")
    # doc 2 repeats the whole passage later: fully cut
    assert got[2]["n_cut_tokens"] == got[2]["n_tokens"] == 10
    assert got[2]["text_deduped"] == ""
    # doc 3 shares no 8-gram: untouched
    assert got[3]["n_cut_tokens"] == 0 and got[3]["text_deduped"] == unique
    # doc 4: 16 tokens, the second 8-token copy is cut, first kept
    assert got[4]["n_tokens"] == 16 and got[4]["n_cut_tokens"] == 8
    assert got[4]["text_deduped"] == inner

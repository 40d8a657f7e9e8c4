"""sessionize_bucketed ≡ sessionize — the skew-hardened plan must be a
pure physical rewrite (r12 verdict task 3). The bucket cut is the
adversarial surface: local sessionization sees a fresh partition at
every cut, so each case below plants events around cuts and pins exact
equality (session_id ordinals included) at a 1-second bucket width that
forces a cut between almost every event pair."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cql_xmlpipe_spark.operators.sessionize import sessionize, sessionize_bucketed

GAP = 400_000  # 0.4 s gap
BKT = 1_000_000  # 1 s buckets — cuts everywhere


def _events(spark, rows):
    """rows: (user_id, event_id, us)."""
    return (
        spark.createDataFrame(rows, "user_id long, event_id long, us long")
        .withColumn("ts", F.timestamp_micros("us"))
        .drop("us")
    )


def _collect(df):
    return sorted(map(tuple, df.collect()))


def _assert_equal(spark, rows, gap=GAP, bucket=BKT):
    e = _events(spark, rows)
    plain = _collect(sessionize(e, gap_us=gap))
    bucketed = _collect(sessionize_bucketed(e, gap_us=gap, bucket_us=bucket))
    assert bucketed == plain
    return plain


def test_session_straddles_cut_merges(spark):
    """Two events GAP-exactly apart across a bucket cut are ONE session
    (<= gap merges); gap+1 across the cut splits."""
    rows = [
        (1, 1, 999_900), (1, 2, 999_900 + GAP),          # cut at 1e6, merge
        (2, 1, 999_900), (2, 2, 999_900 + GAP + 1),      # split
    ]
    got = _assert_equal(spark, rows)
    by_user = {}
    for u, sid, n, st, en in got:
        by_user.setdefault(u, []).append((sid, n))
    assert by_user[1] == [(1, 2)]
    assert sorted(by_user[2]) == [(1, 1), (2, 1)]


def test_session_spans_many_buckets(spark):
    """One dense session crossing 5 cuts stitches back to a single row
    with the full n_events/min/max; a later second session renumbers 2."""
    rows = [(7, i, 500_000 + i * 300_000) for i in range(18)]  # 0.3 s steps
    rows += [(7, 100, 500_000 + 17 * 300_000 + 10 * GAP)]
    got = _assert_equal(spark, rows)
    assert [(r[1], r[2]) for r in got] == [(1, 18), (2, 1)]
    assert got[0][3] == 500_000 and got[0][4] == 500_000 + 17 * 300_000


def test_tie_timestamps_at_cut(spark):
    """Identical timestamps (ordered by event_id) at and around a bucket
    boundary — the stable-order tie-break must survive bucketing."""
    rows = [
        (3, 5, 1_000_000), (3, 2, 1_000_000), (3, 9, 1_000_000),
        (3, 1, 999_999), (3, 8, 1_000_001),
        (3, 20, 3_000_000), (3, 21, 3_000_000),
    ]
    got = _assert_equal(spark, rows)
    assert [(r[1], r[2]) for r in got] == [(1, 5), (2, 2)]


def test_randomized_equivalence_with_hot_user(spark):
    """Property check: 2000 random events, one hot user holding ~40% of
    them, random gaps straddling cuts — bucketed output equals plain
    output exactly at two different bucket widths."""
    rng = random.Random(42)
    rows = []
    eid = 0
    for _ in range(800):
        u = 99 if rng.random() < 0.4 else rng.randrange(20)
        rows.append((u, eid, rng.randrange(0, 30_000_000)))
        eid += 1
    e = _events(spark, rows)
    plain = _collect(sessionize(e, gap_us=GAP))
    for bucket in (BKT, 7 * BKT):
        assert _collect(sessionize_bucketed(e, gap_us=GAP, bucket_us=bucket)) == plain


def test_gate_twin_matches_plain_gate(spark):
    """The driver-visible gate pair on real testdata: bucketed twin ==
    plain gate at sf0.001 with the production gap/bucket constants."""
    from cql_xmlpipe_spark.plans.queries import (
        events_sessionize,
        events_sessionize_bucketed,
    )

    sf = "/root/testdata/sf0.001"
    assert _collect(events_sessionize_bucketed(spark, sf)) == _collect(
        events_sessionize(spark, sf)
    )


# ---------------------------------------------------------------------------
# round 14: the lag/rank generalizations of the pre-bucket + stitch device
# ---------------------------------------------------------------------------


def _seq_events(spark, rows):
    """rows: (user_id, event_id, us, event_type | None)."""
    return spark.createDataFrame(
        rows, "user_id long, event_id long, us long, event_type string"
    )


def test_bucketed_prev_matches_plain_lag(spark):
    """bucketed_prev ≡ LAG over the raw per-user window at a 1-second
    bucket width (cuts between almost every event pair), including:
    empty buckets between events, ties on us broken by event_id across
    a cut, and a NULL value mid-stream that the carry must NOT
    overwrite."""
    from pyspark.sql import Window as W

    from cql_xmlpipe_spark.operators.sessionize import bucketed_prev

    rng = random.Random(7)
    rows = []
    eid = 0
    for u in (1, 2):
        t = 0
        for _ in range(200):
            t += rng.choice([1, 137, 999_999, 1_000_000, 2_000_001, 5_500_000])
            typ = None if rng.random() < 0.1 else rng.choice("abcde")
            rows.append((u, eid, t, typ))
            eid += 1
    # exact tie straddling a bucket cut: same us, ordered by event_id
    rows += [(3, 1000, 1_000_000, "x"), (3, 1001, 1_000_000, "y"),
             (3, 1002, 1_000_000, "z")]
    e = _seq_events(spark, rows)
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    plain = sorted(
        map(tuple, e.withColumn("_prev", F.lag("event_type").over(w)).collect())
    )
    got = sorted(
        map(
            tuple,
            bucketed_prev(e, "event_type", bucket_us=1_000_000)
            .select("user_id", "event_id", "us", "event_type", "_prev")
            .collect(),
        )
    )
    assert got == plain


def test_bucketed_row_number_matches_plain(spark):
    """bucketed_row_number ≡ ROW_NUMBER()-1 + COUNT(*) over the raw
    per-user window, under the same cut-adversarial corpus."""
    from pyspark.sql import Window as W

    from cql_xmlpipe_spark.operators.sessionize import bucketed_row_number

    rng = random.Random(11)
    rows = []
    eid = 0
    for u in (1, 2, 3):
        t = rng.randrange(10)
        for _ in range(150):
            t += rng.choice([1, 999_999, 1_000_000, 3_000_000])
            rows.append((u, eid, t, "e"))
            eid += 1
    e = _seq_events(spark, rows)
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    plain = sorted(
        map(
            tuple,
            e.select(
                "user_id",
                "event_id",
                (F.row_number().over(w) - 1).alias("rn"),
                F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("n"),
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            bucketed_row_number(e, bucket_us=1_000_000)
            .select("user_id", "event_id", "rn", F.col("_n_user").alias("n"))
            .collect(),
        )
    )
    assert got == plain


def test_bucketed_sequence_gate_twins_match_plain(spark, tmp_path):
    """The three r14 gate twins reproduce their plain gates row-for-row
    on the real sf0.001 events table (the gates' own input shape)."""
    from cql_xmlpipe_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    for name in ("events_type_transitions", "events_user_ewma",
                 "events_session_paths"):
        plain = sorted(map(tuple, QUERIES[name](spark, sf).collect()))
        twin = sorted(map(tuple, QUERIES[name + "_bucketed"](spark, sf).collect()))
        assert twin == plain, name

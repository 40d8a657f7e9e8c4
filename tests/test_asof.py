"""as-of join unit tests — including the NULL-value regression: right
rows travel as one struct, so a legitimately-NULL value in the matched
row must NOT be backfilled from an older row."""

from __future__ import annotations

from pyspark.sql import functions as F

from cql_xmlpipe_spark.operators.asof import asof_join


def _mk(spark, rows, ddl):
    return spark.createDataFrame(rows, ddl)


def test_backward_basic_and_ties(spark):
    left = _mk(spark, [(1, 5, "L5"), (1, 10, "L10"), (2, 3, "L3")], "k int, ts int, lv string")
    right = _mk(spark, [(1, 5, "R5"), (1, 7, "R7"), (3, 1, "Rx")], "k int, ts int, rv string")
    got = {
        (r["k"], r["ts"]): (r["r_rv"], r["r_ts"])
        for r in asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts").collect()
    }
    assert got[(1, 5)] == ("R5", 5)  # tie at equal ts matches
    assert got[(1, 10)] == ("R7", 7)  # most recent prior
    assert got[(2, 3)] == (None, None)  # no right rows for key


def test_backward_null_value_not_backfilled(spark):
    """Matched right row has v=NULL: result must be (NULL value, its ts),
    not an older row's value stitched onto the newer timestamp."""
    left = _mk(spark, [(1, 3)], "k int, ts int")
    right = _mk(spark, [(1, 1, 7), (1, 2, None)], "k int, ts int, v int")
    r = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts").collect()[0]
    assert r["r_ts"] == 2
    assert r["r_v"] is None


def test_forward_direction(spark):
    left = _mk(spark, [(1, 5)], "k int, ts int")
    right = _mk(spark, [(1, 4, "past"), (1, 6, "next"), (1, 9, "later")], "k int, ts int, v string")
    r = asof_join(left, right, on=["k"], direction="forward").collect()[0]
    assert r["r_v"] == "next" and r["r_ts"] == 6


def test_forward_tie_matches_same_ts(spark):
    left = _mk(spark, [(1, 5)], "k int, ts int")
    right = _mk(spark, [(1, 5, "same")], "k int, ts int, v string")
    r = asof_join(left, right, on=["k"], direction="forward").collect()[0]
    assert r["r_v"] == "same" and r["r_ts"] == 5

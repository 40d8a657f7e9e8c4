"""Scale-pattern tests: salted aggregation equivalence, bucketed
co-located joins (no exchange), streaming dedup."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from cql_xmlpipe_spark.operators.skew import salted_agg, with_salt
from cql_xmlpipe_spark.sources.registry import load_table
from cql_xmlpipe_spark.streaming.dedup import dedup_stream


SF = "/root/testdata/sf0.001"
DEC = "decimal(30,8)"


def test_salted_agg_equals_plain_agg(spark):
    l = load_table(spark, "lineitem", SF)
    plain = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"),
    )
    salted = salted_agg(
        l,
        keys=["l_returnflag"],
        partial_aggs={
            "n": F.count(F.lit(1)),
            "qty": F.sum(F.col("l_quantity").cast(DEC)),
        },
        final_aggs={
            "n": F.sum("n"),
            "qty": F.sum("qty").cast("double"),
        },
        n_salts=8,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_is_deterministic_and_spread(spark):
    l = load_table(spark, "lineitem", SF).limit(2000)
    a = with_salt(l, 16).select("_salt").collect()
    b = with_salt(l, 16).select("_salt").collect()
    assert [r["_salt"] for r in a] == [r["_salt"] for r in b]
    assert len({r["_salt"] for r in a}) == 16  # all buckets hit


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    """Bucketing both sides on the join key co-locates matching rows:
    the join plans with NO Exchange — the 100 TB fact-fact join layout."""
    # warehouse dir is a static conf (defaults to ./spark-warehouse,
    # gitignored); DROP TABLE in a fresh session doesn't remove orphan
    # locations from crashed runs — clear them explicitly
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    o = load_table(spark, "orders", SF)
    l = load_table(spark, "lineitem", SF)
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
    # force SMJ (tiny sf0.001 sides would broadcast): at fact-fact scale
    # SMJ is what the planner picks anyway, and bucketing removes its
    # exchanges
    joined = (
        bl.hint("merge")
        .join(bo, bl.l_orderkey == bo.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # join itself must not shuffle either side (only the final groupBy may)
    join_part = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_part, join_part
    # and it returns the same result as the unbucketed join
    want = (
        l.join(o, l.l_orderkey == o.o_orderkey).groupBy("o_orderpriority").count()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_dedup_drops_replayed_events(spark, tmp_path):
    """Replay the same events file twice (at-least-once delivery);
    dropDuplicatesWithinWatermark must restore exactly-once."""
    src_dir = tmp_path / "dup_events"
    src_dir.mkdir()
    norm = load_table(spark, "events", SF).limit(500)
    norm.write.parquet(str(src_dir / "a.parquet"))
    norm.write.parquet(str(src_dir / "b.parquet"))

    stream = spark.readStream.schema(norm.schema).parquet(str(src_dir) + "/*")
    q = (
        dedup_stream(stream, keys=["event_id"])
        .writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM t_dedup").collect()[0]
    assert got["n"] == 500 and got["d"] == 500

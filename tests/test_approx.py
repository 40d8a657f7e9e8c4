"""approx_count_distinct (HLL) error-bound check — sketch internals are
engine-specific so there is no SQL oracle; the contract is the rsd bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from cql_xmlpipe_spark.sources.registry import load_table


def test_approx_count_distinct_within_rsd(spark):
    l = load_table(spark, "lineitem", "/root/testdata/sf0.01")
    row = l.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    rel_err = abs(row["approx"] - row["exact"]) / row["exact"]
    # rsd is a standard deviation, not a hard cap; 5 sigma is conservative
    assert rel_err < 0.10, f"approx={row['approx']} exact={row['exact']}"

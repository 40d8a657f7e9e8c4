"""File-format source/sink coverage (SURVEY §2C): parquet/csv/json/orc
round-trips preserve rows; the xmlpipe2 sink is covered by
test_xmlfuncs/test_streaming."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cql_xmlpipe_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    return load_table(spark, "nation", SF)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(fmt, nation, spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fmt") / fmt)
    writer = nation.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(out)

    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", True).schema(nation.schema)
    if fmt == "json":
        reader = reader.schema(nation.schema)
    back = reader.load(out)

    orig = sorted(map(tuple, nation.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == orig


def test_partitioned_parquet_writes_prunable_layout(nation, spark, tmp_path_factory):
    """Partition-by writes the dir layout partition pruning needs; reading
    one partition must scan only that directory (scale-critical)."""
    out = str(tmp_path_factory.mktemp("fmt") / "part")
    nation.write.mode("overwrite").partitionBy("n_regionkey").parquet(out)
    one = spark.read.parquet(out).filter(F.col("n_regionkey") == 0)
    got = {r["n_nationkey"] for r in one.collect()}
    want = {r["n_nationkey"] for r in nation.filter(F.col("n_regionkey") == 0).collect()}
    assert got == want

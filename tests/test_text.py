"""Text-function unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ngrams_keeps_multiplicity(spark):
    from cql_xmlpipe_spark.functions.text import ngrams, shingles, words

    df = spark.createDataFrame([("a b a b a",)], "text string")
    row = df.select(
        ngrams(words(F.col("text")), 2).alias("bi"),
        shingles(words(F.col("text")), 2).alias("sh"),
    ).collect()[0]
    assert row["bi"] == ["a b", "b a", "a b", "b a"]  # duplicates kept, in order
    assert sorted(row["sh"]) == ["a b", "b a"]  # shingles dedup

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


def test_zlib_bytes_matches_local_zlib_and_handles_null(spark):
    import zlib

    from cql_xmlpipe_spark.functions.text import ZLIB_LEVEL, zlib_bytes

    texts = ["hello world " * 50, "abc", "ü" * 10, None, ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["z"] for r in
           df.select("doc_id", zlib_bytes(F.col("text")).alias("z")).collect()}
    for i, t in enumerate(texts):
        want = None if t is None else len(zlib.compress(t.encode("utf-8"), ZLIB_LEVEL))
        assert got[i] == want
    # the repetitive text must compress far below its raw size
    assert got[0] < len(texts[0]) * 0.1

"""Doc-key hash tests: SURVEY §1.4 verified JDK vectors + property tests
(python model vs vectorized numpy batch vs pandas_udf)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cql_xmlpipe_spark.functions.dockey import _sdbm_batch, sdbm_key_py

VECTORS = [
    (0, "http://example.com/a", 4447361795561394557),
    (0, "", 0),
    (5, "", 5),
    (0, "a", 97),
    (7, "url1 42", 1238248254775611051),
    (
        0,
        "overflow test with a considerably longer string to force 64-bit "
        "wraparound behavior",
        7272524425225998485,
    ),
    (0, None, 0),
]


@pytest.mark.parametrize("base,s,expected", VECTORS)
def test_python_model_vectors(base, s, expected):
    assert sdbm_key_py(base, s) == expected


@pytest.mark.parametrize("base,s,expected", VECTORS)
def test_numpy_batch_vectors(base, s, expected):
    bases = np.array([base], dtype=np.int64).view(np.uint64)
    out = _sdbm_batch(bases, pd.Series([s]))
    assert int(out[0]) == expected


@settings(max_examples=300, deadline=None)
@given(
    base=st.integers(min_value=-(2**31), max_value=2**31 - 1),
    s=st.text(max_size=64),  # includes non-BMP code points (UTF-16 parity)
)
def test_batch_matches_python_model(base, s):
    bases = np.array([base], dtype=np.int64).view(np.uint64)
    out = _sdbm_batch(bases, pd.Series([s]))
    assert int(out[0]) == sdbm_key_py(base, s)


def test_udf_on_spark(spark):
    from pyspark.sql import functions as F

    from cql_xmlpipe_spark.functions.dockey import sdbm_key_udf

    rows = [(b, s) for b, s, _ in VECTORS]
    df = spark.createDataFrame(rows, "base long, s string")
    got = {
        (r["base"], r["s"]): r["id"]
        for r in df.select("base", "s", sdbm_key_udf(F.col("base"), F.col("s")).alias("id")).collect()
    }
    for b, s, expected in VECTORS:
        assert got[(b, s)] == expected


def test_with_doc_id_paths(spark):
    """getId semantics: fast path, hashBase consumption, zero-base subtlety."""
    from cql_xmlpipe_spark.operators.xmlpipe import with_doc_id

    # fast path: single integral key -> value verbatim
    df = spark.createDataFrame([(41, "x")], "k int, v string")
    assert with_doc_id(df, ["k"]).collect()[0]["id"] == 41

    # hash path: string key + int key -> int consumed as hashBase,
    # string feeds the hash (README example: -keys url,pos)
    df2 = spark.createDataFrame([("http://example.com/a", 0)], "url string, pos int")
    assert with_doc_id(df2, ["url", "pos"]).collect()[0]["id"] == sdbm_key_py(
        0, "http://example.com/a"
    )

    # base=7 consumed by first int; later int concatenated as text:
    # keys (b, url, n) with b=7, url='url1', n=42 -> sdbm(7, 'url1 42')
    df3 = spark.createDataFrame([(7, "url1", 42)], "b int, url string, n int")
    assert with_doc_id(df3, ["b", "url", "n"]).collect()[0]["id"] == 1238248254775611051

    # hashBase==0 subtlety (Query.java:210): first int is 0 -> consumed but
    # base stays 0 -> SECOND int also consumed as base.
    df4 = spark.createDataFrame([(0, 7, "url1", 42)], "z int, b int, url string, n int")
    assert with_doc_id(df4, ["z", "b", "url", "n"]).collect()[0]["id"] == sdbm_key_py(
        7, "url1 42"
    )

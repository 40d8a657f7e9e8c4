"""Automated driver-contract mirror: every ``queries()`` entry runs on
Spark and (when an oracle exists) against DuckDB over the same parquet,
comparing columns + row counts + order-insensitive values.

Runs at sf0.001 for speed (the driver's real gate runs sf0.01; the
standalone ``tests/oracle_harness.py`` runs any sf on demand)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from cql_xmlpipe_spark.sources.registry import TABLES
from tests.oracle_harness import compare

SF = "/root/testdata/sf0.001"

_QUERIES = entry.queries()
_ORACLES = entry.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    yield con
    con.close()


def test_entry_contract_shape(spark):
    df = entry.entry(spark)
    assert df.count() >= 0
    assert set(_ORACLES) <= set(_QUERIES), "oracle without a query"


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    # cache-leaving operators (collapsed dedup etc.) persist until their
    # result is consumed; clear between parametrized cases so the
    # session-scoped fixture doesn't accumulate storage
    spark.catalog.clearCache()
    df = _QUERIES[name](spark, SF)
    if name not in _ORACLES:
        # rows-only contract: must execute and produce a stable schema
        assert df.columns and df.count() >= 0
        return
    problems, _, _ = compare(name, df, duck.sql(_ORACLES[name]))
    assert not problems, f"{name}: {problems}"

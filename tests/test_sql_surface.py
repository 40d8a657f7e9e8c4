"""SURVEY §2B — the reference's *accepted* query surface (CQL SELECT
shapes forwarded verbatim, `Query.java:151-153`), executed here by
spark.sql over registered views, each checked against DuckDB on the same
parquet. This is the SQL-text path the CLI uses."""

from __future__ import annotations

import duckdb
import pytest

from cql_xmlpipe_spark.sources.registry import TABLES, register_views
from tests.oracle_harness import compare

SF = "/root/testdata/sf0.001"

#: (name, SQL runnable verbatim on BOTH engines)
B_SURFACE = [
    ("b1_projection", "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"),
    ("b2_select_star", "SELECT * FROM region"),
    ("b3_pk_equality", "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey = 7"),
    ("b3_pk_in", "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey IN (1,2,3)"),
    (
        "b4_clustering_range",
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        "WHERE l_orderkey = 5 AND l_linenumber >= 2 AND l_linenumber < 5",
    ),
    (
        "b5_allow_filtering",
        "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' AND o_totalprice < 5000",
    ),
    (
        "b6_b7_order_limit",
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 11",
    ),
    ("b8_count_star", "SELECT COUNT(*) AS n FROM lineitem"),
]


@pytest.fixture(scope="module")
def engines(spark):
    register_views(spark, SF)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    yield spark, con
    con.close()


@pytest.mark.parametrize("name,sql", B_SURFACE, ids=[n for n, _ in B_SURFACE])
def test_b_surface_sql(name, sql, engines):
    spark, con = engines
    problems, _, _ = compare(name, spark.sql(sql), con.sql(sql))
    assert not problems, f"{name}: {problems}"


def test_results_invariant_to_shuffle_partitioning(spark):
    """The cross-engine hash gate implicitly assumes results don't depend
    on physical partitioning (parallel summation order, task count).
    Make that explicit: representative queries across the families that
    COULD be order-sensitive (decimal-sum aggregates, window ranks,
    collapsed near-dedup, stochastic-rounding resample) must produce
    identical sorted rows at 7 and 32 shuffle partitions."""
    from cql_xmlpipe_spark.plans import QUERIES

    names = [
        "q1_pricing_summary",
        "window_top3_orders_per_customer",
        "dedup_minhash_lsh",
        "corpus_mix_resample",
        # round-6 additions whose determinism claims are exactly this
        # property: fixed-point centroid means, left-fold EWMA, decimal
        # z-score moments, ordered path strings
        "embedding_kmeans_iter3",
        "events_user_ewma",
        "events_value_outliers",
        "events_session_paths",
    ]
    sf = "/root/testdata/sf0.01"
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            spark.catalog.clearCache()
            results[parts] = {
                n: sorted(tuple(r) for r in QUERIES[n](spark, sf).collect())
                for n in names
            }
        for n in names:
            assert results["7"][n] == results["32"][n], n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full declared surface
(SURVEY §2) from ``cql_xmlpipe_spark.plans`` — Spark plan + DuckDB
oracle per operator.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

SF_SMOKE = "/root/testdata/sf0.001"


def _plans():
    from cql_xmlpipe_spark.plans import ORACLE, QUERIES

    return QUERIES, ORACLE


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    queries, _ = _plans()
    return queries["q1_pricing_summary"](spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = _plans()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    _, o = _plans()
    return dict(o)

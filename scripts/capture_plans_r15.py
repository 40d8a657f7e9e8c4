"""Capture .explain("formatted") for headline queries into plans/r15/.

Usage: python scripts/capture_plans_r15.py <suffix> [query ...]

suffix is "before" or "after"; with no query list, captures every
bench.py HEADLINE query. Dedup queries execute their CC fixpoint during
plan construction (eager localCheckpoints), so this takes a few minutes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)

    from cql_xmlpipe_spark.plans import QUERIES
    from cql_xmlpipe_spark.session import get_spark

    spark = get_spark("plans-r15")
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: not in QUERIES", flush=True)
            continue
        spark.catalog.clearCache()
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"EXPLAIN FAILED: {exc!r}"
        with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

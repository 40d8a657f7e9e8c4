"""Round-14 optimization profiling: time individual declared queries.

Usage: python scripts/profile_r15.py <query> [<query> ...] [--runs N]

Methodology = bench.py's: force full computation of every projected
column via the xxhash64-fold (no driver-collect bandwidth), time each
run with perf_counter, clearCache between runs. Prints per-run seconds
and the min. Jobs are labelled per guide §1.5 so the timeline is
attributable if the UI is enabled.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    from pyspark.sql import functions as F

    from cql_xmlpipe_spark.plans import QUERIES
    from cql_xmlpipe_spark.session import get_spark

    spark = get_spark("profile-r15")
    spark.range(1).count()

    def _force(df) -> None:
        df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")).agg(
            F.expr("bit_xor(h)")
        ).collect()

    for name in args:
        fn = QUERIES[name]
        # one warmup at sf0.001 to populate the codegen cache
        try:
            _force(fn(spark, "/root/testdata/sf0.001"))
        except Exception:
            pass
        spark.catalog.clearCache()
        times = []
        for i in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            _force(fn(spark, SF_DIR))
            times.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(times):.3f} runs="
            + ",".join(f"{t:.3f}" for t in times),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

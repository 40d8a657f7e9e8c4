"""Phase breakdown of dedup_incremental_rosters at sf0.1 (r15 item 1).

Times each composition phase separately (wall clock between eager
boundaries) plus the number of Spark jobs each phase submits, so the
optimization targets the real cost, not a guess. Methodology as
bench.py (clearCache between runs, min-of-N)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "3"))


def main() -> int:
    from pyspark.sql import functions as F

    from cql_xmlpipe_spark.operators import dedup as DD
    from cql_xmlpipe_spark.session import get_spark
    from cql_xmlpipe_spark.sources.registry import load_table

    spark = get_spark("profile-r15-rosters")
    spark.range(1).count()
    sc = spark.sparkContext

    def _force(df) -> None:
        df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")).agg(
            F.expr("bit_xor(h)")
        ).collect()

    def jobs() -> int:
        try:
            return sc._jsc.sc().dagScheduler().nextJobId().get()
        except Exception:
            try:
                return sc._jsc.sc().statusStore().jobsList(None).size()
            except Exception:
                return -1

    for run in range(RUNS):
        spark.catalog.clearCache()
        t = {}
        j = {}
        t0 = time.perf_counter(); j0 = jobs()
        d = load_table(spark, "documents", SF_DIR)
        corpus = d.filter(F.col("doc_id") % 5 != 0)
        increment = d.filter(F.col("doc_id") % 5 == 0)
        c_staged = DD.stage_corpus_lsh(corpus)
        # materialize the staging explicitly so its cost is its own row
        sc.setJobDescription("phase: corpus staging materialize")
        c_staged[0].write.format("noop").mode("overwrite").save()
        c_staged[1].write.format("noop").mode("overwrite").save()
        t["1_corpus_staging"] = time.perf_counter() - t0; j["1_corpus_staging"] = jobs() - j0

        t0 = time.perf_counter(); j0 = jobs()
        sc.setJobDescription("phase: standing groups (rep pipeline + CC)")
        standing = DD.minhash_groups_collapsed(
            corpus, threshold=0.5, k=3, staged=c_staged
        ).persist()
        t["2_standing_cc_eager"] = time.perf_counter() - t0; j["2_standing_cc_eager"] = jobs() - j0

        t0 = time.perf_counter(); j0 = jobs()
        sc.setJobDescription("phase: standing materialize")
        standing.write.format("noop").mode("overwrite").save()
        t["3_standing_force"] = time.perf_counter() - t0; j["3_standing_force"] = jobs() - j0

        t0 = time.perf_counter(); j0 = jobs()
        sc.setJobDescription("phase: roster update (probe+batch+quotient CC)")
        out = DD.incremental_roster_update(
            corpus, increment, standing, threshold=0.5, k=3, emit="full",
            corpus_staged=c_staged,
        )
        t["4_update_eager"] = time.perf_counter() - t0; j["4_update_eager"] = jobs() - j0

        t0 = time.perf_counter(); j0 = jobs()
        sc.setJobDescription("phase: final force")
        _force(out)
        t["5_final_force"] = time.perf_counter() - t0; j["5_final_force"] = jobs() - j0
        sc.setJobDescription(None)

        DD.unpersist_intermediates(out)
        for c in (standing, *c_staged):
            try:
                c.unpersist()
            except Exception:
                pass
        total = sum(t.values())
        print(f"run {run}: total={total:.2f}s")
        for k in sorted(t):
            print(f"  {k:24s} {t[k]:6.2f}s  jobs={j[k]}")
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())

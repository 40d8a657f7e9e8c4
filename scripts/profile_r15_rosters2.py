"""Sub-phase breakdown of incremental_roster_update's eager segment
(phase 4 of profile_r15_rosters): increment staging, probe pairs,
batch-internal LSH, quotient edges, CC loop, fan-back."""

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

    spark = get_spark("profile-r15-rosters2")
    spark.range(1).count()
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for run in range(RUNS):
        spark.catalog.clearCache()
        t = {}

        def mark(key, fn):
            t0 = time.perf_counter()
            sc.setJobDescription(key)
            out = fn()
            t[key] = time.perf_counter() - t0
            return out

        d = load_table(spark, "documents", SF_DIR)
        corpus = d.filter(F.col("doc_id") % 5 != 0)
        increment = d.filter(F.col("doc_id") % 5 == 0)
        c_staged = DD.stage_corpus_lsh(corpus)
        mark("a_corpus_staging", lambda: noop(c_staged[1]))
        standing = mark(
            "b_standing_groups",
            lambda: DD.minhash_groups_collapsed(
                corpus, threshold=0.5, k=3, staged=c_staged
            ).persist(),
        )
        mark("c_standing_force", lambda: noop(standing))

        i_staged = DD._lsh_prep(increment, "text", "doc_id", 3)
        mark("d_inc_staging", lambda: noop(i_staged[1]))
        cross = DD.incremental_probe_pairs(
            corpus, increment, threshold=0.5, k=3,
            corpus_staged=c_staged, increment_staged=i_staged,
        ).persist()
        mark("e_probe_pairs", lambda: noop(cross))
        batch = DD.minhash_lsh_pairs_collapsed(
            increment, threshold=0.5, k=3, staged=i_staged
        ).persist()
        mark("f_batch_lsh", lambda: noop(batch))
        out = mark(
            "g_assemble_cc",
            lambda: DD._roster_update_assemble(
                cross, batch, standing, "doc_id", "full"
            ),
        )
        mark("h_final_force", lambda: noop(out))
        sc.setJobDescription(None)

        DD.unpersist_intermediates(out)
        for c in (standing, cross, batch, *c_staged, *i_staged):
            try:
                c.unpersist()
            except Exception:
                pass
        print(f"run {run}: total={sum(t.values()):.2f}s")
        for k in sorted(t):
            print(f"  {k:20s} {t[k]:6.2f}s")
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())

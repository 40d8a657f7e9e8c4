"""r15 item 4 A/B: one-process interleaved comparison of the sampled
recall gate with a SHARED membership map (new) vs per-side maps (old).
Same session, alternating runs, clearCache between runs — host band
noise hits both variants equally."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "5"))


def main() -> int:
    from cql_xmlpipe_spark.operators import dedup as DD
    from cql_xmlpipe_spark.session import get_spark
    from cql_xmlpipe_spark.sources.registry import load_table

    spark = get_spark("measure-r15-recall")
    spark.range(1).count()

    def _force(df) -> None:
        df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")).agg(
            F.expr("bit_xor(h)")
        ).collect()

    def run(shared: bool) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        d = load_table(spark, "documents", SF_DIR)
        stratum = d.filter(DD.stratum_filter("doc_id", 0.01))
        s_sets = DD.shingle_hash_sets(stratum).persist()
        s_mem = None
        if shared:
            s_mem = (
                stratum.select(
                    F.col("doc_id"), F.sha2(F.col("text"), 256).alias("_th")
                )
                .select(
                    F.col("doc_id"),
                    F.min("doc_id").over(W.partitionBy("_th")).alias("rep"),
                )
                .persist()
            )
        lsh_full = DD.minhash_lsh_pairs_collapsed(
            stratum, threshold=0.5, k=3, staged=(s_sets, None), mem=s_mem
        )
        exact_full = DD.ngram_jaccard_pairs_collapsed(
            stratum.withColumn("_blk", F.lit(1)),
            block_col="_blk", threshold=0.5, k=3,
            hash_sets=s_sets, mem=s_mem,
        )
        out = DD._recall_wilson_row(
            lsh_full.select("id_a", "id_b"), exact_full.select("id_a", "id_b")
        )
        _force(out)
        dt = time.perf_counter() - t0
        for c in (s_sets, s_mem,
                  *getattr(lsh_full, "_xmlpipe_cached", []),
                  *getattr(exact_full, "_xmlpipe_cached", [])):
            if c is not None:
                try:
                    c.unpersist()
                except Exception:
                    pass
        return dt

    # warm both shapes once
    run(False); run(True)
    old, new = [], []
    for _ in range(REPS):
        old.append(run(False))
        new.append(run(True))
    print("old (two maps):", ["%.2f" % t for t in old], "min=%.2f" % min(old))
    print("new (shared)  :", ["%.2f" % t for t in new], "min=%.2f" % min(new))
    return 0


if __name__ == "__main__":
    sys.exit(main())

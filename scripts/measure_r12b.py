"""Round-12 (session 2) decade measurements for the new operators
(SCALE.md source): seeded shuffle shards, bigram-LM scoring, DSIR
weights, PQ top-k, and SemDeDup at the paper's K ∝ N operating point.

Run after generating the jitter corpora:
  python scripts/make_scale_data.py 10  /root/testdata/sf0.1 /tmp/sparkgraft_sf_x10jit  --jitter
  python scripts/make_scale_data.py 100 /root/testdata/sf0.1 /tmp/sparkgraft_sf_x100jit --jitter
  python scripts/measure_r12b.py

Execution is forced with bench.py's device (xxhash64 fold over every
column + bit_xor aggregate) so lazy projections can't be pruned away.
SemDeDup runs through _semdedup_core with K = max(8, N // 500): fixed
K would grow cluster size (and the within-cluster pair bill) linearly
with the corpus — K ∝ N is what the operator's docstring prescribes,
and this measures it instead of asserting it.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DECADES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("jit-10x", "/tmp/sparkgraft_sf_x10jit"),
    ("jit-100x", "/tmp/sparkgraft_sf_x100jit"),
]


def main() -> int:
    from pyspark.sql import functions as F

    from cql_xmlpipe_spark.operators.dedup import unpersist_intermediates
    from cql_xmlpipe_spark.operators.similarity import pq_topk
    from cql_xmlpipe_spark.plans.extensions import (
        _semdedup_core,
        corpus_shuffle_shards,
        dsir_importance_weights,
        embedding_top_pc_power,
        text_bigram_lm_score,
        text_gopher_rules,
    )
    from cql_xmlpipe_spark.session import get_spark
    from cql_xmlpipe_spark.sources.registry import load_table

    spark = get_spark("measure-r12b")

    def force(df) -> None:
        df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")).agg(
            F.expr("bit_xor(h)")
        ).collect()

    def timed(label: str, build) -> None:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = build()
        force(df)
        wall = time.perf_counter() - t0
        unpersist_intermediates(df)
        print(f"  {label}: {wall:.1f} s", flush=True)

    for tag, d in DECADES:
        if not os.path.isdir(d):
            print(f"skip {tag}: {d} missing")
            continue
        e = load_table(spark, "embeddings", d)
        n_vec = e.count()
        n_doc = load_table(spark, "documents", d).count()
        print(f"{tag}: {n_doc} docs, {n_vec} vectors", flush=True)
        timed("corpus_shuffle_shards", lambda: corpus_shuffle_shards(spark, d))
        timed("text_bigram_lm_score", lambda: text_bigram_lm_score(spark, d))
        timed("dsir_importance_weights", lambda: dsir_importance_weights(spark, d))
        timed("text_gopher_rules", lambda: text_gopher_rules(spark, d))
        timed("embedding_top_pc_power", lambda: embedding_top_pc_power(spark, d))
        q = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
        timed("pq_topk (4x16, shortlist 50)", lambda: pq_topk(e, q, k=10))
        k_clusters = max(8, n_vec // 500)
        t0 = time.perf_counter()
        sem = _semdedup_core(e.select("vec_id", "embedding"), k_clusters, 0.95)
        n_pruned = sem.filter(F.col("is_pruned")).count()
        wall = time.perf_counter() - t0
        unpersist_intermediates(sem)
        print(
            f"  semdedup (K={k_clusters}, tau=0.95): {wall:.1f} s, "
            f"{n_pruned}/{n_vec} pruned",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

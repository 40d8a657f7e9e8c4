"""Round-12 (session 2, wave 2) decade measurements: the WordPiece
tokenizer, the CCNet tercile split, all-but-the-top, hard-negative
mining, and the kNN label audit at production stratum fractions.

Prereq: the jitter corpora from scripts/measure_r12b.py's header.
The kNN audit runs frac = 0.25 / 0.05 / 0.005 across the decades —
the exact bill is frac·N² dot folds, so holding frac·N roughly
constant is the production operating shape (audit a fixed-size
sample regardless of corpus size).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DECADES = [
    ("sf0.1", "/root/testdata/sf0.1", 0.25),
    ("jit-10x", "/tmp/sparkgraft_sf_x10jit", 0.05),
    ("jit-100x", "/tmp/sparkgraft_sf_x100jit", 0.005),
]


def main() -> int:
    from pyspark.sql import functions as F

    from cql_xmlpipe_spark.operators.dedup import unpersist_intermediates
    from cql_xmlpipe_spark.plans.extensions import (
        _knn_label_consistency,
        embedding_remove_top_pc,
        similarity_hard_negatives,
        text_ccnet_buckets,
        text_wordpiece_tokenize,
    )
    from cql_xmlpipe_spark.session import get_spark
    from cql_xmlpipe_spark.sources.registry import load_table

    spark = get_spark("measure-r12c")

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

    for tag, d, frac in DECADES:
        if not os.path.isdir(d):
            print(f"skip {tag}: {d} missing")
            continue
        e = load_table(spark, "embeddings", d)
        n_vec = e.count()
        print(f"{tag}: {n_vec} vectors", flush=True)
        timed("text_wordpiece_tokenize", lambda: text_wordpiece_tokenize(spark, d))
        timed("text_ccnet_buckets", lambda: text_ccnet_buckets(spark, d))
        timed("embedding_remove_top_pc", lambda: embedding_remove_top_pc(spark, d))
        timed(
            "similarity_hard_negatives", lambda: similarity_hard_negatives(spark, d)
        )
        timed(
            f"knn_label_consistency (frac={frac})",
            lambda: _knn_label_consistency(e, frac),
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Round-10 scale measurements (SCALE.md cells).

Measures, on the round-7 adversarial corpora in /tmp (reused r9→r10;
regenerate with scripts/make_scale_data.py if absent):

  A. skew-100×  — embedding_near_dup_groups wall-clock (the roster
     contract on the 20k-identical hot family) vs the pair contract's
     pre-flight refusal (stage-1 pricing 209M rows).
  B. jitter-100× — the two-stage max_pairs guard cost on a pass-through
     run (both pre-flight actions execute, job proceeds) vs an
     unguarded run; plus embedding_near_dup_groups on the
     collapse-resistant corpus (every replica a true near-dup,
     collapse buys nothing — the worst case).
  C. jitter-10× / jitter-100× — dedup_minhash_recall_sampled at the
     production 1% stratum: wall-clock vs the exact gate's bill
     (299.8 s / 4,968.6 s, SCALE.md r9) and estimate vs the exact
     recall (0.98963 / 0.98948).

Usage: python scripts/measure_r10.py [A|B|C ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X100_SKEW = "/tmp/sparkgraft_sf_x100_skew"
X100_JIT = "/tmp/sparkgraft_sf_x100_jit"
X10_JIT = "/tmp/sparkgraft_sf_x10_jit"


def _spark():
    from cql_xmlpipe_spark.session import get_spark

    return get_spark("measure-r10")


def _timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"[{label}] {dt:.1f} s :: {out}")
    return dt, out


def _load(spark, d, t):
    from cql_xmlpipe_spark.sources.registry import load_table

    return load_table(spark, t, d)


def measure_a(spark):
    from cql_xmlpipe_spark.operators import dedup as DD

    emb = _load(spark, X100_SKEW, "embeddings")
    try:
        t0 = time.perf_counter()
        DD.embedding_near_dup_pairs(emb, threshold=0.95, max_pairs=100_000_000)
    except DD.PairOutputBudgetExceeded as exc:
        print(f"[A pair refusal] {time.perf_counter() - t0:.1f} s :: {str(exc)[:140]}")
    spark.catalog.clearCache()

    def roster():
        out = DD.embedding_near_dup_groups(emb, threshold=0.95)
        rows = out.count()
        top = out.orderBy(out.cluster_size.desc()).select("cluster_size").head(2)
        DD.unpersist_intermediates(out)
        return f"{rows} rosters, top sizes {[r[0] for r in top]}"

    _timed("A skew-100x embedding_near_dup_groups", roster)
    spark.catalog.clearCache()


def measure_b(spark):
    from pyspark.sql import functions as F

    from cql_xmlpipe_spark.operators import dedup as DD

    emb = _load(spark, X100_JIT, "embeddings")

    def run(max_pairs):
        out = DD.embedding_near_dup_pairs(emb, threshold=0.95, max_pairs=max_pairs)
        n = out.count()
        DD.unpersist_intermediates(out)
        return f"{n} pairs"

    for label, cap in (("B unguarded", None), ("B guarded pass-through", 10**12)):
        spark.catalog.clearCache()
        _timed(f"{label} jitter-100x pairs", lambda c=cap: run(c))

    spark.catalog.clearCache()

    def roster():
        out = DD.embedding_near_dup_groups(emb, threshold=0.95)
        rows = out.count()
        sizes = out.agg(
            F.max("cluster_size").alias("mx"), F.sum("cluster_size").alias("tot")
        ).collect()[0]
        DD.unpersist_intermediates(out)
        return f"{rows} rosters, max size {sizes['mx']}, members {sizes['tot']}"

    _timed("B jitter-100x embedding_near_dup_groups", roster)
    spark.catalog.clearCache()


def measure_c(spark):
    from cql_xmlpipe_spark.operators import dedup as DD

    for label, d in (("C jitter-10x", X10_JIT), ("C jitter-100x", X100_JIT)):
        docs = _load(spark, d, "documents")

        def sampled():
            out = DD.minhash_recall_sampled(
                docs, threshold=0.35, k=3, sample_frac=0.01
            )
            row = out.collect()[0]
            DD.unpersist_intermediates(out)
            return (
                f"n_exact={row['n_exact']} n_found={row['n_found']} "
                f"recall_est={row['recall_est']} "
                f"ci=[{row['ci95_lo']}, {row['ci95_hi']}]"
            )

        _timed(f"{label} recall_sampled frac=0.01", sampled)
        spark.catalog.clearCache()


def main():
    which = set(a.upper() for a in sys.argv[1:]) or {"A", "B", "C"}
    spark = _spark()
    if "A" in which:
        measure_a(spark)
    if "B" in which:
        measure_b(spark)
    if "C" in which:
        measure_c(spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())

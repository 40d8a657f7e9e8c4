"""Round-14 decade measurements.

Prereq: the jitter corpora (already on disk from r12/r13):
  python scripts/make_scale_data.py 10  /root/testdata/sf0.1 /tmp/sparkgraft_sf_x10jit  --jitter
  python scripts/make_scale_data.py 100 /root/testdata/sf0.1 /tmp/sparkgraft_sf_x100jit --jitter

What is measured (all at the |Q| = N/97 query shape, k = 10):

* ``pq_topk`` per-call at every decade, 2-rep at jit-100× — the r13
  `weak` item: the ADC stage was a per-pair Column fold + full
  per-partition comparison sort (83.7 s steady at jit-100×); r14
  replaces it with the numpy LUT-gather shortlist + exact fold re-cut.
* ``pq_query`` (staged index, build excluded) at jit-100× — the
  production build-once/query-many number; the gap to per-call IS the
  per-subspace KMeans training bill.
* ``topk_matmul`` blocked vs single-closure at jit-100× — the query-
  block path must cost ~n_blocks corpus scans and return the identical
  result (hash-compared here, not just row counts).
* radius banded vs matmul at t = 0.9 at jit-10× — the second decade of
  the crossover (r13 measured jit-100× only), so RADIUS_MAX_PLANES
  guidance cites data at two decades.
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

    from cql_xmlpipe_spark.operators.similarity import (
        pq_build,
        pq_query,
        pq_topk,
        radius_search,
        topk_matmul,
    )
    from cql_xmlpipe_spark.session import get_spark
    from cql_xmlpipe_spark.sources.registry import load_table

    spark = get_spark("measure-r14")

    def fhash(df):
        return df.select(
            F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")
        ).agg(F.expr("bit_xor(h)")).collect()[0][0]

    def timed(label: str, build, reps: int = 1):
        for rep in range(1, reps + 1):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = build()
            h = fhash(df)
            wall = time.perf_counter() - t0
            print(f"  {label} rep{rep}: {wall:.1f} s hash={h}", flush=True)
        return h

    for tag, d in DECADES:
        if not os.path.isdir(d):
            print(f"skip {tag}: {d} missing")
            continue
        print(f"{tag}:", flush=True)
        e = load_table(spark, "embeddings", d)
        q = e.filter(F.col("vec_id") % 97 == 0).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
        )
        n = e.count()
        print(f"  corpus={n} |Q|~{n // 97}", flush=True)
        reps = 2 if tag == "jit-100x" else 1
        timed("pq_topk(per-call)", lambda: pq_topk(e, q, k=10), reps=reps)
        if tag == "jit-100x":
            # staged: build once outside the timer, persist codes like
            # the sink does, then time the query half alone (2-rep)
            codes, books = pq_build(e)
            codes = codes.persist()
            codes.count()
            for rep in (1, 2):
                t0 = time.perf_counter()
                h = fhash(pq_query(e, q, codes, books, k=10))
                print(
                    f"  pq_query(staged) rep{rep}: "
                    f"{time.perf_counter() - t0:.1f} s hash={h}",
                    flush=True,
                )
            codes.unpersist()
            # blocked topk_matmul: force 4 blocks, hash-compare to the
            # single-closure run
            h1 = timed("topk_matmul(1 block)", lambda: topk_matmul(e, q, k=10), reps=2)
            # pick a cap that yields ~4 blocks for this |Q|
            dim = e.select(F.size("embedding")).first()[0]
            qmb = max(1, int((n // 97) * dim * 8 / 4e6))
            h2 = timed(
                f"topk_matmul(blocked, max_query_mb={qmb})",
                lambda: topk_matmul(e, q, k=10, max_query_mb=qmb),
                reps=2,
            )
            print(f"  blocked-equality: {'OK' if h1 == h2 else 'MISMATCH'}", flush=True)
        if tag == "jit-10x":
            timed(
                "radius_banded_t090",
                lambda: radius_search(e, q, 0.90, candidates="banded", n_hint=n),
            )
            timed(
                "radius_matmul_t090",
                lambda: radius_search(e, q, 0.90, candidates="matmul"),
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Round-14b decade measurement: IVF-PQ vs its siblings at jit-100x.

Prereq: the jitter corpus (already on disk from r12/r13):
  python scripts/make_scale_data.py 100 /root/testdata/sf0.1 /tmp/sparkgraft_sf_x100jit --jitter

What is measured (N = 200k, |Q| = N/97 ~ 2061, k = 10):

* ``ivfpq_query`` (staged index, build excluded, persisted like the
  sink does) 2-rep — the production build-once/query-many number. The
  design claim: the cell gate drops the ADC gather bill to
  ~n_probe/n_cells (3/16 ~ 19%) of ``pq_query``'s, so the composite
  should beat the 4.7 s staged-PQ steady state measured in r14a.
* ``pq_query`` (staged) 2-rep in the SAME session — the same-host
  comparator, so the gap is the cell gate, not a host band.
* ``ivfpq_topk`` per-call 1-rep — the gate shape; the delta to staged
  is the two KMeans training stages (coarse + m residual subspaces).
* recall@10 of the staged IVF-PQ run vs exact (``topk_matmul``) at the
  same shape — the operating-point honesty check at scale.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/sparkgraft_sf_x100jit"


def main() -> int:
    from pyspark.sql import functions as F

    from cql_xmlpipe_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_query,
        ivfpq_topk,
        pq_build,
        pq_query,
        topk_matmul,
    )
    from cql_xmlpipe_spark.session import get_spark
    from cql_xmlpipe_spark.sources.registry import load_table

    spark = get_spark("measure-r14b")

    def fhash(df):
        return df.select(
            F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")
        ).agg(F.expr("bit_xor(h)")).collect()[0][0]

    e = load_table(spark, "embeddings", CORPUS)
    q = e.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    n = e.count()
    print(f"corpus={n} |Q|~{n // 97}", flush=True)

    # staged IVF-PQ: build outside the timer, persist the index rows
    t0 = time.perf_counter()
    index, centers, books = ivfpq_build(e)
    index = index.persist()
    index.count()
    print(f"ivfpq_build (persisted): {time.perf_counter() - t0:.1f} s", flush=True)
    for rep in (1, 2):
        t0 = time.perf_counter()
        df = ivfpq_query(e, q, index, centers, books, k=10)
        if rep == 2:
            # rep 2 materializes its result once and serves BOTH the
            # timed hash and the recall rows below — no third untimed
            # query pass (it would cost another full staged-query wall)
            df = df.persist()
        h = fhash(df)
        print(
            f"ivfpq_query(staged) rep{rep}: "
            f"{time.perf_counter() - t0:.1f} s hash={h}",
            flush=True,
        )
    ivfpq_rows = {
        (r["q_id"], r["vec_id"])
        for r in df.select("q_id", "vec_id").collect()
    }
    df.unpersist()
    index.unpersist()

    # same-session staged PQ comparator
    codes, pq_books = pq_build(e)
    codes = codes.persist()
    codes.count()
    for rep in (1, 2):
        t0 = time.perf_counter()
        h = fhash(pq_query(e, q, codes, pq_books, k=10))
        print(
            f"pq_query(staged) rep{rep}: "
            f"{time.perf_counter() - t0:.1f} s hash={h}",
            flush=True,
        )
    codes.unpersist()

    # per-call gate shape (includes both KMeans stages)
    t0 = time.perf_counter()
    h = fhash(ivfpq_topk(e, q, k=10))
    print(f"ivfpq_topk(per-call) rep1: {time.perf_counter() - t0:.1f} s hash={h}",
          flush=True)

    # operating-point recall vs exact at the same shape
    t0 = time.perf_counter()
    exact = {(r["q_id"], r["vec_id"]) for r in
             topk_matmul(e, q, k=10).select("q_id", "vec_id").collect()}
    print(f"topk_matmul(exact baseline): {time.perf_counter() - t0:.1f} s",
          flush=True)
    print(f"ivfpq recall@10 at jit-100x: {len(ivfpq_rows & exact) / len(exact):.3f}",
          flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

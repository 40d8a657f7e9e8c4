"""Round-13 decade measurements: the radius-search scale paths that
replace the 241 s brute-force wall SCALE.md:1409 recorded at the 100×
decade (the r12 verdict's single `weak` component).

Prereq: the jitter corpora from scripts/measure_r12b.py's header:
  python scripts/make_scale_data.py 10  /root/testdata/sf0.1 /tmp/sparkgraft_sf_x10jit  --jitter
  python scripts/make_scale_data.py 100 /root/testdata/sf0.1 /tmp/sparkgraft_sf_x100jit --jitter

What is measured:
* ``radius_auto_t035`` — the GATE query (threshold 0.35, |Q| = N/97)
  through the new candidates="auto" dispatch: broadcast (codegen fold)
  while N·|Q| ≤ 1e8, Arrow/BLAS matmul past it — so the 100× decade now
  rides the matmul plan instead of grinding the fold.
* ``radius_matmul_t035`` — the matmul path forced at every decade
  (apples-to-apples against the 241 s fold record).
* ``radius_banded_t090`` / ``radius_matmul_t090`` — the high-threshold
  regime at the 100× decade, where the banded sign-key candidate join
  prunes the N·|Q| bill instead of scanning it; matmul alongside as the
  exact-same-semantics baseline. (At t=0.35 banding cannot prune — the
  LSH exponent ρ→1 — which is why the low-threshold scale path is BLAS,
  not LSH; see operators/similarity.py::radius_search.)
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

    from cql_xmlpipe_spark.operators.similarity import radius_search
    from cql_xmlpipe_spark.session import get_spark
    from cql_xmlpipe_spark.sources.registry import load_table

    spark = get_spark("measure-r13")

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
        print(f"  {label}: {wall:.1f} s rows={df.count()}", flush=True)

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
        timed("radius_auto_t035", lambda: radius_search(e, q, 0.35))
        timed(
            "radius_matmul_t035",
            lambda: radius_search(e, q, 0.35, candidates="matmul"),
        )
        if tag == "jit-100x":
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

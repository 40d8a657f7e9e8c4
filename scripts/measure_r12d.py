"""Round-12 (session 3) decade measurements: the curation-wave-3
operators — tempered mixture weights, the epoch plan, the domain cap,
cosine radius search, and character entropy.

Prereq: the jitter corpora from scripts/measure_r12b.py's header:
  python scripts/make_scale_data.py 10  /root/testdata/sf0.1 /tmp/sparkgraft_sf_x10jit  --jitter
  python scripts/make_scale_data.py 100 /root/testdata/sf0.1 /tmp/sparkgraft_sf_x100jit --jitter

Expected shapes: the three corpus planners are one keyed aggregate +
1-row broadcasts (wall ~ token-count scan, linear); radius search is
|Q|·N dot folds with |Q| = N/97, so the brute-force gate shape is
N²/97 — super-linear BY DESIGN at fixed query fraction (the scale
path swaps candidate generation to the banded sign-key join; the
measured factor documents why); char entropy shuffles ≤38 rows per
doc (map-side combine over the folded alphabet), linear.
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
    from cql_xmlpipe_spark.plans.extensions import (
        corpus_domain_cap,
        corpus_epoch_plan,
        corpus_mix_temperature,
        similarity_radius_search,
        text_char_entropy,
    )
    from cql_xmlpipe_spark.session import get_spark

    spark = get_spark("measure-r12d")

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
        print(f"{tag}:", flush=True)
        timed("corpus_mix_temperature", lambda: corpus_mix_temperature(spark, d))
        timed("corpus_epoch_plan", lambda: corpus_epoch_plan(spark, d))
        timed("corpus_domain_cap", lambda: corpus_domain_cap(spark, d))
        timed(
            "similarity_radius_search", lambda: similarity_radius_search(spark, d)
        )
        timed("text_char_entropy", lambda: text_char_entropy(spark, d))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

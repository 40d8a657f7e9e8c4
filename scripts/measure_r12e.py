"""Round-12 (session 3, wave 2) decade measurements: prototypicality
pruning and asymmetric containment at the jittered decades, plus the
codec-true video chain at sf0.1/10× (pixel volume is text-derived, so
the jitter corpora exercise it too; the 100× cell is skipped — the
chain is mapInPandas-linear by construction and the 10× point already
costs its full per-row decode bill).

Prereq: the jitter corpora from scripts/measure_r12b.py's header.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DECADES = [
    ("sf0.1", "/root/testdata/sf0.1", True),
    ("jit-10x", "/tmp/sparkgraft_sf_x10jit", True),
    ("jit-100x", "/tmp/sparkgraft_sf_x100jit", False),
]


def main() -> int:
    from pyspark.sql import functions as F

    from cql_xmlpipe_spark.operators.dedup import unpersist_intermediates
    from cql_xmlpipe_spark.plans.extensions import (
        embedding_prototypicality,
        multimodal_frame_sample_codec,
        text_ngram_containment,
    )
    from cql_xmlpipe_spark.session import get_spark

    spark = get_spark("measure-r12e")

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

    for tag, d, video in DECADES:
        if not os.path.isdir(d):
            print(f"skip {tag}: {d} missing")
            continue
        print(f"{tag}:", flush=True)
        timed(
            "embedding_prototypicality", lambda: embedding_prototypicality(spark, d)
        )
        timed("text_ngram_containment", lambda: text_ngram_containment(spark, d))
        if video:
            timed(
                "multimodal_frame_sample_codec",
                lambda: multimodal_frame_sample_codec(spark, d),
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

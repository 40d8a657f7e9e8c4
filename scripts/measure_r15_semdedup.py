"""r15 item 3 prototype: numpy within-cluster pair stage for semdedup.

Checks, per SF:
  1. decision-set equivalence (exceptAll both ways == 0) between the
     Column-fold pair stage and the numpy pair stage;
  2. the minimal |cos - tau| margin over all within-cluster candidate
     pairs (both engines' rounding differs only in dot-sum order; a
     flip needs a pair within ~1e-13 of tau — report the real margin);
  3. wall-clock A/B of the full semdedup_prune query.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    from cql_xmlpipe_spark.functions.vectors import dot as vdot
    from cql_xmlpipe_spark.functions.vectors import norm
    from cql_xmlpipe_spark.plans.extensions import (
        _SEMDEDUP_TAU,
        _planted_embeddings,
        _semdedup_core,
    )
    from cql_xmlpipe_spark.session import get_spark

    spark = get_spark("measure-r15-semdedup")
    spark.range(1).count()

    def _force(df) -> None:
        df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")).agg(
            F.expr("bit_xor(h)")
        ).collect()

    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        spark.catalog.clearCache()
        e = _planted_embeddings(spark, sf_dir)
        # margin analysis over ALL within-cluster pairs of the CURRENT code:
        # reuse the assignment by running the core up to `el`
        out_cur = _semdedup_core(e, 8, _SEMDEDUP_TAU)
        cur = out_cur.select("vec_id", "cluster_id", "is_pruned", "kept_by")
        cur_rows = cur.collect()

        # margin: rebuild el from the persisted asg cache inside out_cur
        asg = out_cur._xmlpipe_cached[0]  # (vec_id, cluster_id, embedding)
        el = asg.withColumn("nrm", norm(F.col("embedding"))).filter(
            F.col("nrm") > 0
        )
        a = el.select(
            "cluster_id", F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("emb_a"), F.col("nrm").alias("nrm_a"),
        )
        b = el.select(
            "cluster_id", F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("emb_b"), F.col("nrm").alias("nrm_b"),
        )
        margin = (
            a.join(b, "cluster_id")
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                F.abs(
                    vdot(F.col("emb_a"), F.col("emb_b"))
                    / (F.col("nrm_a") * F.col("nrm_b"))
                    - F.lit(_SEMDEDUP_TAU)
                ).alias("m")
            )
            .agg(F.min("m").alias("min_margin"))
            .collect()[0]["min_margin"]
        )
        print(f"sf{sf}: min |cos-tau| margin = {margin!r}", flush=True)

        # numpy variant over the same assignment
        import numpy as np
        import pandas as pd

        tau = _SEMDEDUP_TAU

        def prune_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("vec_id")
            ids = pdf["vec_id"].to_numpy()
            V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            nr = pdf["nrm"].to_numpy(dtype=np.float64)
            g = len(ids)
            if g < 2:
                return pd.DataFrame({"vec_id": [], "kept_by": []}).astype(
                    {"vec_id": "int64", "kept_by": "int64"}
                )
            out_v, out_k = [], []
            blk = 4096
            row_idx = np.arange(g)
            for j0 in range(0, g, blk):
                j1 = min(j0 + blk, g)
                Gb = V @ V[j0:j1].T
                cos = Gb / np.outer(nr, nr[j0:j1])
                mask = cos >= tau
                # only rows strictly above the column's global index
                mask &= row_idx[:, None] < np.arange(j0, j1)[None, :]
                any_col = mask.any(axis=0)
                first = mask.argmax(axis=0)
                sel = np.flatnonzero(any_col)
                out_v.append(ids[j0 + sel])
                out_k.append(ids[first[sel]])
            return pd.DataFrame(
                {"vec_id": np.concatenate(out_v), "kept_by": np.concatenate(out_k)}
            )

        pruned_np = (
            el.select("cluster_id", "vec_id", "embedding", "nrm")
            .groupBy("cluster_id")
            .applyInPandas(prune_cluster, "vec_id long, kept_by long")
        )
        out_np = (
            asg.select("vec_id", "cluster_id")
            .join(pruned_np, "vec_id", "left")
            .select(
                "vec_id", "cluster_id",
                F.col("kept_by").isNotNull().alias("is_pruned"), "kept_by",
            )
        )
        np_rows = out_np.collect()
        same = sorted(map(tuple, cur_rows)) == sorted(map(tuple, np_rows))
        print(f"sf{sf}: numpy == column-fold: {same}", flush=True)
        if not same:
            cs = set(map(tuple, cur_rows)) - set(map(tuple, np_rows))
            ns = set(map(tuple, np_rows)) - set(map(tuple, cur_rows))
            print("  only-cur:", sorted(cs)[:5])
            print("  only-np :", sorted(ns)[:5])
        from cql_xmlpipe_spark.operators.dedup import unpersist_intermediates
        unpersist_intermediates(out_cur)

    # wall A/B at sf0.1 (current full query; numpy timing added once
    # implemented in _semdedup_core — this baseline is the reference)
    from cql_xmlpipe_spark.plans import QUERIES
    fn = QUERIES["semdedup_prune"]
    for label in ("current",):
        times = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            _force(fn(spark, "/root/testdata/sf0.1"))
            times.append(time.perf_counter() - t0)
        print(f"semdedup_prune {label}: min={min(times):.2f} {['%.2f' % t for t in times]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

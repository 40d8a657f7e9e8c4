"""Synthesize an sf1-scale dataset by key-offset replication of sf0.1.

Usage: python scripts/make_scale_data.py [copies] [src_sf_dir] [out_dir]
                                         [--jitter] [--skew]

The driver provides sf{0.001,0.01,0.1} only; the scaling story at 100 TB is
an extrapolation unless we measure at least one decade. This replicates the
sf0.1 fact tables N× (default 10) with disjoint key ranges per copy — join
fan-outs, group cardinalities, and window partition counts all grow the way
a real sf1 would — and leaves the dimension tables (region/nation) alone.
Text/embedding payloads repeat verbatim, so dedup finds each document's
N-1 clones: a deliberately adversarial (near-dup-heavy) corpus for the
candidate-pair path.

``--jitter`` makes the replicated corpus COLLAPSE-RESISTANT: each copy
i > 0 rewrites every 17th token of each document (append a copy marker),
so clones become near-duplicates (3-shingle Jaccard ≈ 0.6-0.8) instead of
exact duplicates. The exact-collapse staging then buys nothing — this
measures the dedup family's worst case, guarding against the collapse
having overfit the clone-replication benchmark. Embeddings get the
analogous treatment: copy i > 0 adds deterministic per-component noise
(ε = 0.3 relative RMS, uniform [-1, 1] from xxhash64(vec_id, j, i)),
putting original↔copy cosine ≈ 0.985 and copy↔copy ≈ 0.97 — every
replica pair is a TRUE near-dup above the 0.95 threshold, but with
~5-8% of hyperplane signs flipped, so the banded sign-LSH has to earn
its recall instead of matching identical signatures.

``--skew`` plants hot keys AFTER replication: one user receives ~10% of
all events (hot window/sessionization partition), one document text is
shared by ~10% of all docs (hot LSH band bucket + giant dup group), and
one embedding is shared by ~10% of all vectors (hot sign-LSH family —
the C(hot,2) irreducible-output shape measured in SCALE.md).
This is the skewed-key hazard SCALE.md names — the smoke that measures
it instead of arguing about it.

Writes parquet OUTSIDE the read-only testdata tree (default /tmp). Not part
of the test suite — a measurement tool for SCALE.md / BASELINE.md numbers.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cql_xmlpipe_spark.session import get_spark
from cql_xmlpipe_spark.sources.registry import TABLES, load_table

#: key columns to offset per copy so replicated rows get disjoint key ranges
KEY_OFFSETS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: tables copied through unchanged (shared dimensions)
PASSTHROUGH = ["region", "nation"]


def _jitter_text(part, i: int):
    """Rewrite every 17th token with a copy marker — deterministic,
    engine-side (no Python), turning copy i's documents into NEAR
    duplicates of the originals (most shingles survive, ~18% change)."""
    toks = F.split(F.col("text"), " ")
    edited = F.transform(
        toks,
        lambda t, j: F.when(j % 17 == 0, F.concat(t, F.lit(f"j{i}"))).otherwise(t),
    )
    return part.withColumn("text", F.array_join(edited, " "))


def _jitter_embedding(part, i: int):
    """Perturb copy i's embeddings into near-duplicates of the originals:
    x_j += 0.3 · rms(v) · u_j with u_j deterministic uniform [-1, 1] from
    xxhash64(vec_id, j, i). E[u²] = 1/3, so |δ|/|v| ≈ 0.3/√3 ≈ 0.17 and
    cos(v, v') ≈ 0.985; two independent copies sit at ≈ 0.97 — all
    replica pairs stay above the 0.95 near-dup threshold while flipping
    ~5-8% of sign-LSH hyperplane votes. Engine-side Column exprs only."""
    rms = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
        / F.size("embedding")
    )
    edited = F.transform(
        "embedding",
        lambda x, j: (
            x.cast("double")
            + F.lit(0.3)
            * rms
            * ((F.pmod(F.xxhash64(F.col("vec_id"), j, F.lit(i)), F.lit(2001)) - 1000)
               / 1000.0)
        ).cast("float"),
    )
    return part.withColumn("embedding", edited)


def main() -> int:
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    jitter = "--jitter" in flags
    skew = "--skew" in flags
    copies = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    suffix = ("_jit" if jitter else "") + ("_skew" if skew else "")
    out = args[2] if len(args) > 2 else f"/tmp/sparkgraft_sf_x{copies}{suffix}"

    spark = get_spark("make-scale-data")
    os.makedirs(out, exist_ok=True)

    for name in TABLES:
        df = load_table(spark, name, src)
        if name in PASSTHROUGH:
            scaled = df
        else:
            keys = KEY_OFFSETS[name]
            # offset stride: comfortably above the source's max key
            strides = {
                k: df.agg(F.max(k)).collect()[0][0] + 1 for k in keys
            }
            parts = []
            for i in range(copies):
                part = df
                for k in keys:
                    part = part.withColumn(k, F.col(k) + F.lit(i * strides[k]))
                if jitter and name == "documents" and i > 0:
                    part = _jitter_text(part, i)
                if jitter and name == "embeddings" and i > 0:
                    part = _jitter_embedding(part, i)
                parts.append(part)
            scaled = parts[0]
            for part in parts[1:]:
                scaled = scaled.unionByName(part)
            if skew and name == "events":
                # ~10% of ALL events land on one hot user (user_id 0)
                scaled = scaled.withColumn(
                    "user_id",
                    F.when(F.col("event_id") % 10 == 0, F.lit(0)).otherwise(
                        F.col("user_id")
                    ),
                )
            if skew and name == "documents":
                # ~10% of ALL docs share one text: a giant exact-dup
                # family = one hot LSH bucket + one hot sha256 group
                hot = scaled.filter(F.col("doc_id") == 0).select(
                    F.col("text").alias("_hot")
                )
                # the crossJoin below yields ZERO rows if doc_id 0 is
                # absent (e.g. an id-offset source corpus) — fail loudly
                # instead of writing an empty table and printing success
                if hot.limit(1).count() == 0:
                    raise SystemExit(
                        f"--skew needs doc_id == 0 in {src}/documents; none found"
                    )
                scaled = scaled.crossJoin(F.broadcast(hot)).withColumn(
                    "text",
                    F.when(F.col("doc_id") % 10 == 0, F.col("_hot")).otherwise(
                        F.col("text")
                    ),
                ).drop("_hot")
            if skew and name == "embeddings":
                # ~10% of ALL vectors share one embedding: a giant
                # identical family = one hot sign-LSH bucket per band
                hot = scaled.filter(F.col("vec_id") == 0).select(
                    F.col("embedding").alias("_hot")
                )
                if hot.limit(1).count() == 0:
                    raise SystemExit(
                        f"--skew needs vec_id == 0 in {src}/embeddings; none found"
                    )
                scaled = scaled.crossJoin(F.broadcast(hot)).withColumn(
                    "embedding",
                    F.when(F.col("vec_id") % 10 == 0, F.col("_hot")).otherwise(
                        F.col("embedding")
                    ),
                ).drop("_hot")
        dest = os.path.join(out, f"{name}.parquet")
        scaled.write.mode("overwrite").parquet(dest)
        print(f"{name}: -> {dest}")
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())

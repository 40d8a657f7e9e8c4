"""Synthesize an sf1-scale dataset by key-offset replication of sf0.1.

Usage: python scripts/make_scale_data.py [copies] [src_sf_dir] [out_dir]

The driver provides sf{0.001,0.01,0.1} only; the scaling story at 100 TB is
an extrapolation unless we measure at least one decade. This replicates the
sf0.1 fact tables N× (default 10) with disjoint key ranges per copy — join
fan-outs, group cardinalities, and window partition counts all grow the way
a real sf1 would — and leaves the dimension tables (region/nation) alone.
Text/embedding payloads repeat verbatim, so dedup finds each document's
N-1 clones: a deliberately adversarial (near-dup-heavy) corpus for the
candidate-pair path.

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


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sparkgraft_sf_x{copies}"

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
                parts.append(part)
            scaled = parts[0]
            for part in parts[1:]:
                scaled = scaled.unionByName(part)
        dest = os.path.join(out, f"{name}.parquet")
        scaled.write.mode("overwrite").parquet(dest)
        print(f"{name}: -> {dest}")
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())

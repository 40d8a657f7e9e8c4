"""Round-14 skew audit of the per-user window gates (r13 verdict task 6).

The r13 sessionize measurement showed a 20M-event hot user serializing
the plain per-user window into one 40-58 s straggler. The remaining
raw-user-key gates are audited here against the same adversarial shape:
a synthetic 21M-event corpus (hot user 0: 20M events over 30 days with
a >10-min session break every ~1000 events so paths stay bounded and
sessions are real; 5,000 cold users × 200 events), written as a real
events.parquet so the GATE functions run unmodified.

Measured per gate: the plain form vs its r14 ``_bucketed`` twin (same
oracle, pre-bucket + stitch devices), plus
``window_top3_orders_per_customer`` on a hot-customer orders corpus —
expected to need NO twin because rank<=3 gets Spark 4's partial
WindowGroupLimit (each input partition is cut to <=3 rows per customer
BEFORE the shuffle), which this measurement verifies rather than
assumes. Equality between plain and bucketed is hash-checked inline.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_DIR = "/tmp/sparkgraft_hotkey"


def main() -> int:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from cql_xmlpipe_spark.plans.queries import QUERIES
    from cql_xmlpipe_spark.session import get_spark

    spark = get_spark("measure-r14skew")

    US_DAY = 86_400_000_000
    START = 1_704_067_200_000_000  # 2024-01-01 UTC, microseconds
    SPAN = 30 * US_DAY

    ev_path = f"{HOT_DIR}/events.parquet"
    if not os.path.isdir(ev_path):
        # hot user 0: 20M events, ~128ms apart, plus a >10min jump every
        # 1000 events (id div 1000 * 11 min) => ~20k real sessions
        hot = spark.range(20_000_000).select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                F.lit(START)
                + F.col("id") * F.lit(128_000)
                + (F.col("id") / F.lit(1000)).cast("long") * F.lit(660_000_000)
            ).alias("ts"),
            F.lit(0).alias("user_id"),
            F.concat(F.lit("t"), F.pmod(F.xxhash64("id"), F.lit(5))).alias(
                "event_type"
            ),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)).cast("double") / 10.0)
            .alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        cold = spark.range(1_000_000).select(
            (F.col("id") + 100_000_000).alias("event_id"),
            F.timestamp_micros(
                F.lit(START) + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(SPAN))
            ).alias("ts"),
            (1 + F.pmod(F.xxhash64("id"), F.lit(5000))).alias("user_id"),
            F.concat(F.lit("t"), F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5))).alias(
                "event_type"
            ),
            (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(1000)).cast("double") / 10.0)
            .alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        hot.unionByName(cold).repartition(32).write.mode("overwrite").parquet(ev_path)
        print(f"wrote {ev_path}", flush=True)

    orders_path = f"{HOT_DIR}/orders.parquet"
    if not os.path.isdir(orders_path):
        # hot customer 0: 20M orders; 5,000 cold customers × 200
        spark.range(21_000_000).select(
            F.col("id").alias("o_orderkey"),
            F.when(F.col("id") < 20_000_000, F.lit(0))
            .otherwise(1 + F.pmod(F.xxhash64("id"), F.lit(5000)))
            .alias("o_custkey"),
            (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10_000_000)).cast("double")
             / 100.0).alias("o_totalprice"),
        ).repartition(32).write.mode("overwrite").parquet(orders_path)
        print(f"wrote {orders_path}", flush=True)

    def fhash(df):
        return df.select(
            F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")
        ).agg(F.expr("bit_xor(h)")).collect()[0][0]

    def timed(label, build, reps=2):
        h = None
        for rep in range(1, reps + 1):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            h = fhash(build())
            print(
                f"  {label} rep{rep}: {time.perf_counter() - t0:.1f} s hash={h}",
                flush=True,
            )
        return h

    for name in ("events_type_transitions", "events_user_ewma",
                 "events_session_paths"):
        print(f"{name}:", flush=True)
        hp = timed("plain", lambda: QUERIES[name](spark, HOT_DIR))
        hb = timed("bucketed", lambda: QUERIES[name + "_bucketed"](spark, HOT_DIR))
        print(f"  equality: {'OK' if hp == hb else 'MISMATCH'}", flush=True)

    # window_top3 on the hot-customer orders: expected to ride the
    # partial WindowGroupLimit with no straggler
    print("window_top3_orders_per_customer (hot-customer corpus):", flush=True)
    def w3():
        # the gate body, pointed at the synthetic orders
        w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
        return (
            spark.read.parquet(orders_path)
            .select(
                "o_custkey", "o_orderkey", "o_totalprice",
                F.row_number().over(w).alias("rn"),
            )
            .filter(F.col("rn") <= 3)
        )
    timed("rank<=3 window", w3)
    plan = w3()._jdf.queryExecution().executedPlan().toString()
    print(f"  WindowGroupLimit in plan: {'WindowGroupLimit' in plan}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

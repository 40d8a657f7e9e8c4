"""TPC-H completion block — the 13 query shapes not yet in ``queries.py``.

With this module the engine covers all 22 TPC-H query shapes (q13 lives in
``queries.py`` as ``outer_join_order_distribution``). The driver's testdata
is a *slim* TPC-H: there is no ``partsupp`` table and ``lineitem`` lacks
``l_commitdate``/``l_receiptdate``/``l_shipmode`` (see TESTDATA.md), so:

* **faithful** (modulo dropped output columns): q7, q10, q14, q15;
* **adapted** (documented per-query): q2/q9/q11/q16/q20 derive the
  part–supplier relation from lineitem (``ps(partkey, suppkey,
  supplycost=MIN(l_extendedprice/l_quantity))``) — the natural bridge the
  data actually contains; q12/q21 define lateness as
  ``l_shipdate > o_orderdate + INTERVAL`` since receipt/commit dates don't
  exist; q22 keys the "country code" on ``c_nationkey`` (no ``c_phone``).

Every query keeps the *shape* that makes the original interesting —
correlated min (q2), two-sided nation pairing (q7), scalar-subquery
threshold (q11, q22), exists/not-exists decorrelation (q21) — and follows
this package's determinism rules (see ``queries.py`` module docstring):
decimal-exact sums rendered to double via the VARCHAR hop, IEEE expression
trees with identical association on both engines, explicit tie-breaking
total orders under every LIMIT.

Scale notes (100 TB): every dimension join (supplier/part/nation/region)
is an explicit ``broadcast``; the only shuffles are fact⋈fact joins and
aggregates keyed on high-cardinality keys (orderkey/partkey/custkey) —
co-partitioned so AQE coalesces; scalar thresholds are 1-row broadcast
cross joins, never driver-side ``collect``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cql_xmlpipe_spark.plans.queries import _osum, _q, dsum
from cql_xmlpipe_spark.sources.registry import load_table

#: lineitem-derived part–supplier bridge (the partsupp surrogate): unit
#: price floor per (part, supplier). Per-row division is one IEEE op,
#: MIN is order-independent — bit-stable cross-engine.
_PS_SQL = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           MIN(l_extendedprice / l_quantity) AS ps_supplycost
    FROM lineitem GROUP BY l_partkey, l_suppkey
"""


def _ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    return l.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost")
    )


@_q(
    "q2_min_cost_supplier",
    f"""
    WITH ps AS ({_PS_SQL}),
    eu AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost,
             s_name, s_acctbal, n_name
      FROM ps JOIN supplier ON s_suppkey = ps_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    best AS (SELECT ps_partkey AS b_partkey, MIN(ps_supplycost) AS b_cost
             FROM eu GROUP BY ps_partkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
    FROM part JOIN eu ON p_partkey = ps_partkey
              JOIN best ON b_partkey = ps_partkey
    WHERE p_size = 15 AND p_type = 'STANDARD' AND ps_supplycost = b_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted — no partsupp; bridge derived from lineitem):
    min-cost supplier per part within a region, i.e. a correlated-MIN
    subquery decorrelated to a per-part MIN-window re-checked on equality
    (r14: previously a per-part aggregate re-JOINED on equality — that
    referenced the bridge+broadcast-joins subtree twice, executing the
    whole lineitem aggregate twice, plus a join exchange; the window
    shares the subtree's single partkey exchange, one pass). Supplier/
    nation/region lookups are broadcast. Cost equality compares the
    *same* IEEE double on both sides (MIN of identical divisions — the
    window MIN is the same aggregate over the same rows)."""
    ps = _ps(spark, sf_dir)
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_type")
    eu = (
        ps.join(F.broadcast(s), F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("ps_partkey", "ps_suppkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    from pyspark.sql import Window as W

    # the broadcast p-join only drops whole parts (p_partkey is unique),
    # so the per-part MIN over the joined rows equals the pre-join
    # decorrelated aggregate for every surviving part
    return (
        eu.join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .withColumn(
            "b_cost",
            F.min("ps_supplycost").over(W.partitionBy("ps_partkey")),
        )
        .filter(F.col("ps_supplycost") == F.col("b_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@_q(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year, {_osum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate BETWEEN TIMESTAMP '1995-01-01'
                           AND TIMESTAMP '1996-12-31')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (faithful): bilateral trade volume between two nations by
    year. The disjunctive nation-pair predicate lands *after* broadcast
    joins to the two nation lookups (aliased scans), so the two fact⋈fact
    shuffles (lineitem⋈orders on orderkey, ⋈customer on custkey) are the
    only exchanges; supplier/nation are broadcast."""
    l = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp_ntz"))
    )
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(vol).alias("revenue"))
    )


@_q(
    "q9_product_profit",
    f"""
    SELECT nation, o_year, {_osum('amount')} AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%')
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted — supply cost := 10% of p_retailprice, the
    deterministic stand-in for the absent ps_supplycost): profit by
    supplier nation and order year over a part-name substring filter.
    The part filter is broadcast *into* the lineitem scan (pushed semi
    side), leaving lineitem⋈orders as the only big shuffle. The per-row
    amount is the same association on both engines:
    ``(price*(1-disc)) - ((0.1*retail)*qty)``."""
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        F.lit(0.1) * F.col("p_retailprice")
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
    )


@_q(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           {_osum('l_extendedprice * (1 - l_discount)')} AS revenue,
           c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-10-01'
      AND o_orderdate < TIMESTAMP '1996-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (faithful, minus the address/phone/comment columns the
    slim schema omits): top-20 customers by returned-item revenue for one
    quarter. Quarter filter prunes orders before the fact⋈fact shuffle;
    nation is broadcast; c_custkey breaks revenue ties for a total order
    under the LIMIT."""
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    l = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@_q(
    "q11_important_stock",
    f"""
    WITH nat AS (
      SELECT l_partkey, l_extendedprice * (1 - l_discount) AS val
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey = 7)
    SELECT l_partkey AS ps_partkey, {_osum('val')} AS part_value
    FROM nat
    GROUP BY l_partkey
    HAVING {_osum('val')} >
      (SELECT {_osum('val')} * 0.001 FROM nat)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted — "stock value" := lineitem revenue routed
    through one nation's suppliers, since there is no partsupp/availqty):
    parts whose value exceeds a fraction of the nation-wide total. The
    global threshold is a 1-row aggregate broadcast-cross-joined into the
    per-part aggregate — the scalar-subquery HAVING decorrelation — and
    both sums are exact-decimal so the threshold comparison is the same
    pair of doubles on both engines."""
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir).filter(F.col("s_nationkey") == 7).select(
        "s_suppkey"
    )
    nat = l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")).select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"),
    )
    per_part = nat.groupBy("l_partkey").agg(dsum(F.col("val")).alias("part_value"))
    total = nat.agg((dsum(F.col("val")) * 0.001).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("ps_partkey"), "part_value")
    )


@_q(
    "q12_shipping_delay",
    """
    SELECT delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN datediff('day', o_orderdate, l_shipdate) >= 90
                    THEN 'LATE'
                  WHEN datediff('day', o_orderdate, l_shipdate) >= 30
                    THEN 'NORMAL'
                  ELSE 'FAST' END AS delay_bucket
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01')
    GROUP BY delay_bucket
    """,
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted — no l_shipmode/l_commitdate/l_receiptdate:
    the "mode" becomes a ship-delay bucket computed from
    ``l_shipdate - o_orderdate``): per-bucket counts of high- vs
    low-priority order lines, the conditional-count-over-join pattern.
    One co-partitioned orderkey shuffle; day arithmetic on midnight
    timestamps is integral on both engines."""
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderpriority", "o_orderdate")
    l = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_shipdate")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay >= 90, F.lit("LATE"))
        .when(delay >= 30, F.lit("NORMAL"))
        .otherwise(F.lit("FAST"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@_q(
    "q14_promo_revenue",
    f"""
    SELECT 100.0 * CAST({_osum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} AS DOUBLE)
             / CAST({_osum('l_extendedprice * (1 - l_discount)')} AS DOUBLE)
             AS promo_revenue,
           COUNT(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (faithful): promotional revenue share for one month —
    conditional-sum ratio over a broadcast part join. Month filter prunes
    the scan; both sums are exact decimals; ``(100*promo)/total`` is the
    same IEEE sequence on both engines."""
    l = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            ((F.lit(100.0) * dsum(promo)) / dsum(rev)).alias("promo_revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_q(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {_osum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (faithful): supplier(s) hitting the max quarterly revenue.
    The view becomes a per-supplier aggregate; the MAX scalar subquery is
    a 1-row broadcast cross join; equality compares the identical
    decimal-derived double. Supplier lookup is broadcast."""
    l = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_q(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted — the part–supplier relation comes from
    lineitem and the "customer complaints" exclusion becomes negative
    account balance, since s_comment doesn't exist): distinct-supplier
    counts per (brand, type, size) with a NOT-IN supplier exclusion.
    The exclusion is a broadcast anti join (null-safe by construction:
    s_suppkey is a non-null key); part lookup broadcast; the distinct
    aggregate shuffles once on the group key."""
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, "supplier", sf_dir).filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    l = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_q(
    "q20_excess_supply",
    f"""
    WITH red AS (
      SELECT l_partkey, l_suppkey, l_quantity
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'),
    part_tot AS (
      SELECT l_partkey AS t_partkey, {_osum('l_quantity')} AS tot_qty
      FROM red GROUP BY l_partkey),
    supp_part AS (
      SELECT l_suppkey AS sp_suppkey, l_partkey AS sp_partkey,
             {_osum('l_quantity')} AS supp_qty
      FROM red GROUP BY l_suppkey, l_partkey)
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT sp_suppkey FROM supp_part JOIN part_tot ON sp_partkey = t_partkey
      WHERE supp_qty > 0.12 * tot_qty)
    """,
)
def q20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted — "availqty exceeds half of demand" becomes
    "this supplier shipped >12% of the part's total quantity", the
    dominance relation the lineitem bridge supports): suppliers dominating
    any 'red%' part, via a nested IN whose inner side joins a per-(supp,
    part) aggregate against a per-part total — both shuffles keyed on
    partkey (co-located). The IN decorrelates to a left-semi join."""
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    l = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey", "l_quantity")
    red = l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    part_tot = red.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        dsum(F.col("l_quantity")).alias("tot_qty")
    )
    supp_part = red.groupBy(
        F.col("l_suppkey").alias("sp_suppkey"), F.col("l_partkey").alias("sp_partkey")
    ).agg(dsum(F.col("l_quantity")).alias("supp_qty"))
    dominant = (
        supp_part.join(part_tot, F.col("sp_partkey") == F.col("t_partkey"))
        .filter(F.col("supp_qty") > 0.12 * F.col("tot_qty"))
        .select("sp_suppkey")
    )
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    return (
        s.join(dominant, F.col("s_suppkey") == F.col("sp_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


@_q(
    "q21_late_suppliers",
    """
    WITH ll AS (
      SELECT l_orderkey, l_suppkey, o_orderstatus,
             l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
    per_order AS (
      SELECT l_orderkey AS po_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
      FROM ll GROUP BY l_orderkey)
    SELECT s_name, COUNT(*) AS numwait
    FROM ll JOIN per_order ON po_orderkey = l_orderkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation ON s_nationkey = n_nationkey
    WHERE late AND o_orderstatus = 'F' AND n_name = 'NATION_5'
      AND n_supp > 1 AND n_late_supp = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted — "late" := shipped more than 90 days after
    the order date, since receipt/commit dates don't exist): suppliers in
    one nation who were the *sole* late supplier on a multi-supplier
    finished order. The EXISTS/NOT-EXISTS pair decorrelates to per-order
    aggregates over the (order, supplier) grain; see the in-body comment
    for why the fact stream is consumed exactly once (49.5 -> 10.0 s at
    the 100x century smoke vs the naive re-join decorrelation);
    supplier/nation broadcast."""
    # single-pass shape: o_orderstatus is constant per order, so the 'F'
    # filter moves onto orders BEFORE the fact join (non-F orders never
    # touch lineitem); the stream then collapses ONCE to the (order,
    # supplier) grain carrying both the late flag and the late-row count
    # as partials, and every later step (per-order totals, the
    # sole-late-supplier filter, numwait) runs at that collapsed grain —
    # the 60M-row join output is consumed exactly once, where the naive
    # EXISTS/NOT-EXISTS decorrelation re-joined it against its own
    # aggregate (two full passes + countDistinct expansion)
    l = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    o_f = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("int")
    per_supp = (
        l.join(o_f, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(late).alias("supp_late"),
            F.sum(late).alias("n_late_rows"),
        )
    )
    # per-order totals as a WINDOW over the orderkey partitioning the
    # (order, supplier) grain already has (r14): the old groupBy+join-back
    # referenced per_supp twice, executing the fact join and its collapse
    # twice — the window shares one exchange and one pass (integer
    # count/sum, exact either way)
    from pyspark.sql import Window as W

    w_ord = W.partitionBy("l_orderkey")
    per_supp = per_supp.withColumn(
        "n_supp", F.count(F.lit(1)).over(w_ord)
    ).withColumn("n_late_supp", F.sum("supp_late").over(w_ord))
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_5").select(
        "n_nationkey"
    )
    return (
        per_supp
        .filter(
            (F.col("supp_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@_q(
    "q22_global_opportunity",
    f"""
    WITH potential AS (
      SELECT c_custkey, c_acctbal, c_nationkey FROM customer
      WHERE c_nationkey IN (3, 7, 11, 15, 19, 21, 24)),
    thr AS (
      SELECT {_osum('c_acctbal')} / COUNT(*) AS avg_bal
      FROM potential WHERE c_acctbal > 0.0)
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           {_osum('c_acctbal')} AS totacctbal
    FROM potential, thr
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-06-01')
    GROUP BY c_nationkey
    """,
)
def q22_global_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted — the phone-prefix country code becomes
    c_nationkey, and "never ordered" becomes "no order since mid-1999"
    because every customer in this corpus has old orders): wealthy but
    recently-inactive customers per country. The AVG threshold is
    decimal-exact (sum/count, not a double AVG — parallel order can't
    perturb it) broadcast as a 1-row cross join; the NOT EXISTS is a
    broadcast anti join against the pruned recent-orders scan."""
    c = load_table(spark, "customer", sf_dir).filter(
        F.col("c_nationkey").isin(3, 7, 11, 15, 19, 21, 24)
    ).select("c_custkey", "c_acctbal", "c_nationkey")
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        (dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") >= F.lit("1999-06-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )

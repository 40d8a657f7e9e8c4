"""Declared query surface (SURVEY §2) with DuckDB oracle SQL.

Every entry in ``QUERIES`` is ``name -> fn(spark, sf_dir) -> DataFrame``;
``ORACLE[name]`` is ANSI SQL DuckDB runs over the same parquet views. The
driver hash-compares both sides at sf0.01, so all of this is written for
**bit-exact cross-engine determinism**:

* double aggregates go through ``DECIMAL(30,8)`` (exact, order-independent)
  and cast back to double — parallel summation order can't perturb bits;
* element-wise double folds (dot products) are left-to-right on both
  engines (``aggregate``/``zip_with`` ↔ ``list_reduce``);
* timestamps leave the query as DATE or as explicitly-formatted strings;
* every computed column is aliased identically on both sides.

Coverage map (SURVEY §2): B1-B8 scan/filter/order/limit/count; §2C joins
(broadcast/semi/anti/outer), aggregation (group/rollup/cube/distinct),
windows (ranking/analytic/frames), set ops, scalar function library,
event-time windows + sessionization; §2A kernel (xmlpipe export, sdbm doc
ids, <mem> transform) — the sdbm oracle re-implements the hash IN SQL via
HUGEINT modular arithmetic; §2D dedup / similarity / text analysis /
multimodal manifest.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cql_xmlpipe_spark.functions import text as TX
from cql_xmlpipe_spark.functions.vectors import cosine
from cql_xmlpipe_spark.sources.registry import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

DEC = "decimal(30,8)"


def _q(name: str, oracle: str | None = None):
    def wrap(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return wrap


def dsum(col) -> F.Column:
    """Order-independent double sum: exact decimal accumulation."""
    return F.sum(col.cast(DEC)).cast("double")


def _osum(expr: str) -> str:
    # the VARCHAR hop matters: DuckDB's direct DECIMAL->DOUBLE divides the
    # scaled int128 by 10^scale in floating point (two roundings, up to
    # 1 ulp off), while decimal->string->double is correctly rounded via
    # strtod — which is exactly what Spark's BigDecimal.doubleValue
    # produces. Caught by a real 1-ulp mismatch at sf0.1 (q8 denominator).
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)"


# ---------------------------------------------------------------------------
# §2B/§2C — relational core on the TPC-H-ish tables
# ---------------------------------------------------------------------------


@_q(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_osum('l_quantity')} AS sum_qty,
           {_osum('l_extendedprice')} AS sum_base_price,
           {_osum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {_osum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {_osum('l_quantity')} / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_q(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey,
           {_osum('l_extendedprice * (1 - l_discount)')} AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    l = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@_q(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name, {_osum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@_q(
    "q6_forecast_revenue",
    f"""
    SELECT {_osum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure predicate + scalar aggregate — the whole query
    collapses into the scan + one partial/final agg pair."""
    l = load_table(spark, "lineitem", sf_dir)
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_q(
    "q19_disjunctive_join",
    f"""
    SELECT {_osum('l_extendedprice * (1 - l_discount)')} AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
)
def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: equi-join plus a disjunction of residual
    predicates — Catalyst keeps the hash join on p_partkey and evaluates
    the OR as a post-join filter (vs a nested-loop disaster if the
    disjunction were treated as the join condition)."""
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    j = l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@_q(
    "q8_market_share",
    f"""
    SELECT year(o_orderdate) AS o_year,
           CAST({_osum("CASE WHEN n_name = 'NATION_7' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
                AS DOUBLE)
             / CAST({_osum('l_extendedprice * (1 - l_discount)')} AS DOUBLE)
             AS mkt_share,
           COUNT(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
    GROUP BY year(o_orderdate)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share per year — a fact⋈fact join
    (lineitem⋈orders, the one unavoidable shuffle) with the supplier→nation
    lookup broadcast, then a conditional-aggregate ratio. Per-row revenue
    products are IEEE doubles (deterministic), both sums accumulate as
    exact decimals (order-independent), and the final share divides two
    exact-valued doubles — bit-identical cross-engine."""
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_rev = F.when(F.col("n_name") == "NATION_7", rev).otherwise(F.lit(0))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (dsum(nat_rev) / dsum(rev)).alias("mkt_share"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_q(
    "q17_small_quantity_revenue",
    f"""
    WITH agg AS (
      SELECT l_partkey AS a_partkey,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS VARCHAR)
                  AS DOUBLE) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey)
    SELECT p_brand,
           {_osum('l_extendedprice')} / 7.0 AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN agg ON a_partkey = l_partkey
    WHERE l_quantity < 0.2 * (sum_qty / cnt)
    GROUP BY p_brand
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below 20% of their part's average quantity.
    The correlated-avg subquery decorrelates to a per-part aggregate
    re-joined to lineitem (both sides shuffle on l_partkey — co-located,
    no second shuffle for the join itself under AQE). The threshold is
    ``0.2 * (exact-decimal-sum-as-double / count)`` so the comparison is
    the same IEEE sequence on both engines. (r14 note: the window form
    of this decorrelation — one scan, one exchange — was implemented and
    measured 1.0 → 1.8 s in the interleaved bench: the window's full
    sort of the fact rows costs more than the second pruned columnar
    scan + hash aggregate. Q2/Q21 keep their window forms because their
    doubled subtrees were expensive; a bare fact scan is not.)"""
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    agg = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(agg, F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * (F.col("sum_qty") / F.col("cnt")))
        .groupBy("p_brand")
        .agg(
            (dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_q(
    "filter_scan_pushdown",
    """
    SELECT l_orderkey, l_partkey, l_quantity,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity >= 10 AND l_quantity < 20
    """,
)
def filter_scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    return l.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") < 20)
    ).select(
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@_q(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark plans this as TakeOrderedAndProject — no global sort at scale.
    return (
        load_table(spark, "orders", sf_dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@_q(
    "count_star",
    """
    SELECT (SELECT COUNT(*) FROM lineitem) AS n_lineitem,
           (SELECT COUNT(*) FROM orders) AS n_orders
    """,
)
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure plan: two single-row aggregates cross-joined — no driver-side
    action at construction time (each side is a partial-count HashAggregate;
    the 1×1 cross join is trivially broadcast)."""
    nl = load_table(spark, "lineitem", sf_dir).agg(
        F.count(F.lit(1)).alias("n_lineitem")
    )
    no = load_table(spark, "orders", sf_dir).agg(F.count(F.lit(1)).alias("n_orders"))
    return nl.crossJoin(F.broadcast(no))


@_q(
    "semi_join_customers_with_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 400000)
    """,
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@_q(
    "anti_join_customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@_q(
    "anti_join_customers_planted",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_custkey % 10 <> 0)
    """,
)
def anti_join_customers_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join with a PLANTED non-empty answer (r12 verdict task 5):
    the natural ``anti_join_customers_without_orders`` gate is an
    oracle-matched ZERO at sf0.01 — every customer has an order — so
    its pass only pins the no-false-positive side. Here the order side
    is thinned in-query (orders of custkey % 10 == 0 excluded), so
    every such customer that exists becomes a true anti-join row and
    the gate pins non-empty output by value. Same left-anti plan shape
    (broadcast/shuffled hash anti on the key)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_custkey") % 10 != 0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@_q(
    "not_in_subquery_suppliers",
    """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem
                            WHERE l_returnflag = 'R' AND l_quantity > 49)
    """,
)
def not_in_subquery_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery — plans as a NULL-AWARE anti join (a NULL in the
    subquery result empties the output, unlike NOT EXISTS; both engines
    implement the same three-valued logic, which this query pins)."""
    load_table(spark, "supplier", sf_dir).createOrReplaceTempView("_ni_supplier")
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("_ni_lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM _ni_supplier
        WHERE s_suppkey NOT IN (SELECT l_suppkey FROM _ni_lineitem
                                WHERE l_returnflag = 'R' AND l_quantity > 49)
        """
    )


@_q(
    "outer_join_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def outer_join_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@_q(
    "rollup_region_nation_acctbal",
    f"""
    SELECT r_name, n_name,
           {_osum('c_acctbal')} AS total_acctbal, COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_region_nation_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            dsum(F.col("c_acctbal")).alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@_q(
    "cube_status_priority",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders, {_osum('o_totalprice')} AS total_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "orders", sf_dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
    )


@_q(
    "window_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        load_table(spark, "orders", sf_dir)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@_q(
    "window_running_revenue",
    """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS VARCHAR) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return load_table(spark, "orders", sf_dir).select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("o_orderdate"),
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_total"),
    )


@_q(
    "window_ranking_gauntlet",
    """
    SELECT o_orderkey, o_orderstatus,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER wt AS quartile,
           PERCENT_RANK() OVER w AS prnk,
           CUME_DIST() OVER w AS cdist,
           FIRST_VALUE(o_orderkey) OVER wt AS first_key,
           LAST_VALUE(o_orderkey) OVER
             (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) OVER
             (PARTITION BY o_orderstatus ORDER BY o_totalprice
              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS VARCHAR) AS DOUBLE) AS range_running
    FROM orders
    WINDOW w  AS (PARTITION BY o_orderstatus ORDER BY o_totalprice),
           wt AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ranking_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking/analytic window coverage: rank, dense_rank, ntile,
    percent_rank, cume_dist, first/last_value, and a RANGE frame (peers
    of equal o_totalprice aggregate together — vs the ROWS frames used
    elsewhere). Tie-sensitive functions (ntile, first/last_value) order
    by a total key; tie-insensitive ones keep the natural order."""
    o = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice")
    wt = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    w_all = wt.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    w_range = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_totalprice")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(wt).alias("quartile"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.first("o_orderkey").over(wt).alias("first_key"),
        F.last("o_orderkey").over(w_all).alias("last_key"),
        F.sum(F.col("o_totalprice").cast(DEC)).over(w_range).cast("double").alias("range_running"),
    )


@_q(
    "window_lag_lead_events",
    """
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
           value - LAG(value) OVER w AS delta_value,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        (F.col("value") - F.lag("value").over(w)).alias("delta_value"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@_q(
    "set_ops_customer_segments",
    """
    SELECT 'union' AS op, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION
      SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    UNION ALL
    SELECT 'intersect' AS op, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
)
def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return (
        a.union(b).distinct().select(F.lit("union").alias("op"), "c_custkey")
        .unionByName(a.intersect(b).select(F.lit("intersect").alias("op"), "c_custkey"))
        # subtract = EXCEPT DISTINCT; exceptAll().distinct() is NOT the
        # same (a duplicate in `a` also present in `b` would survive)
        .unionByName(a.subtract(b).select(F.lit("except").alias("op"), "c_custkey"))
    )


@_q(
    "set_ops_all_variants",
    """
    SELECT 'union_all' AS op, l_orderkey FROM (
      SELECT l_orderkey FROM lineitem WHERE l_quantity > 49
      UNION ALL
      SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.09)
    UNION ALL
    SELECT 'intersect_all' AS op, l_orderkey FROM (
      SELECT l_orderkey FROM lineitem WHERE l_quantity > 49
      INTERSECT ALL
      SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.09)
    UNION ALL
    SELECT 'except_all' AS op, l_orderkey FROM (
      SELECT l_orderkey FROM lineitem WHERE l_quantity > 49
      EXCEPT ALL
      SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.09)
    """,
)
def set_ops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) set-op variants — unionAll/intersectAll/exceptAll
    preserve duplicate multiplicity, unlike the distinct forms above."""
    l = load_table(spark, "lineitem", sf_dir)
    a = l.filter(F.col("l_quantity") > 49).select("l_orderkey")
    b = l.filter(F.col("l_discount") >= 0.09).select("l_orderkey")
    return (
        a.unionAll(b).select(F.lit("union_all").alias("op"), "l_orderkey")
        .unionByName(a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "l_orderkey"))
        .unionByName(a.exceptAll(b).select(F.lit("except_all").alias("op"), "l_orderkey"))
    )


@_q(
    "distinct_counts",
    """
    SELECT (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_orders,
           (SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem))
             AS n_part_supp,
           (SELECT COUNT(DISTINCT l_returnflag) FROM lineitem) AS n_flags
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three exact distinct counts as INDEPENDENT distinct→count subplans
    cross-joined (1-row sides, broadcast). A single agg with 3×
    countDistinct plans an Expand that triples every row before the
    shuffle — measured 2× slower at the 6M-row scale smoke. Split, each
    distinct prunes to its own columns and shuffles only its own keys.
    (At 100 TB you'd reach for approx_count_distinct — see
    approx_distinct_parts — but the exact op should still plan well.)"""
    l = load_table(spark, "lineitem", sf_dir)
    a = l.select("l_orderkey").distinct().agg(F.count(F.lit(1)).alias("n_orders"))
    b = (
        l.select("l_partkey", "l_suppkey")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_part_supp"))
    )
    c = l.select("l_returnflag").distinct().agg(F.count(F.lit(1)).alias("n_flags"))
    return a.crossJoin(F.broadcast(b)).crossJoin(F.broadcast(c))


@_q(
    "approx_distinct_parts",
    """
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_bound
    FROM lineitem
    """,
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++, rsd=0.05). The raw sketch estimate is
    engine-specific, so the HASHED output is the exact count plus a
    ``within_bound`` boolean: |approx − exact| / exact ≤ 3·rsd. HLL is
    deterministic on fixed data, so the flag is stable, the oracle computes
    the exact side, and a broken sketch (or a bound violation) flips the
    flag and fails the hash — making the approx op gate-checkable instead
    of ``no_oracle``. tests/test_approx.py asserts the tighter bound."""
    l = load_table(spark, "lineitem", sf_dir)
    agg = l.agg(
        F.approx_count_distinct("l_partkey", rsd=0.05).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    rel_err = F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col("exact_parts")
    return agg.select("exact_parts", (rel_err <= F.lit(0.15)).alias("within_bound"))


@_q(
    "math_conditional_gauntlet",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - l_quantity * 1000) AS abs_diff,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS above_30k,
           CAST(l_partkey % 7 AS BIGINT) AS pk_mod7,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS qty_band,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    """,
)
def math_conditional_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional scalar library (§2C): abs/floor/ceil/sign/mod/
    greatest/least/sqrt/ln + CASE/nullif/coalesce. Transcendentals are
    rounded to 6 dp — IEEE libm implementations differ in the last ulp
    across engines; integer-exact ops are compared raw. All codegen'd
    Column exprs over the scan."""
    l = load_table(spark, "lineitem", sf_dir)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000).alias("abs_diff"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil(F.col("l_discount") * 100).cast("long").alias("disc_pct_ceil"),
        F.signum(F.col("l_extendedprice") - 30000).alias("above_30k"),
        (F.col("l_partkey") % 7).cast("long").alias("pk_mod7"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_band"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    )


@_q(
    "full_outer_join_snapshot_diff",
    """
    WITH new AS (SELECT doc_id, md5(text) AS h FROM documents),
    old AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v1' ELSE text END) AS h
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, md5(text) AS h
      FROM documents WHERE doc_id % 11 = 0),
    j AS (
      SELECT n.doc_id AS n_id, o.doc_id AS o_id, n.h AS n_h, o.h AS o_h
      FROM new n FULL JOIN old o ON n.doc_id = o.doc_id)
    SELECT CASE WHEN o_id IS NULL THEN 'added'
                WHEN n_id IS NULL THEN 'deleted'
                WHEN n_h <> o_h THEN 'updated'
                ELSE 'unchanged' END AS status,
           COUNT(*) AS n,
           CAST(MIN(COALESCE(n_id, o_id)) AS BIGINT) AS min_id,
           CAST(MAX(COALESCE(n_id, o_id)) AS BIGINT) AS max_id
    FROM j
    GROUP BY CASE WHEN o_id IS NULL THEN 'added'
                  WHEN n_id IS NULL THEN 'deleted'
                  WHEN n_h <> o_h THEN 'updated'
                  ELSE 'unchanged' END
    """,
)
def full_outer_join_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (§2C join-type checklist) doing real work: the
    ingestion-diff step of an incremental corpus pipeline — classify each
    doc as added / deleted / updated / unchanged between a derived
    previous snapshot and the current table, comparing 16-byte content
    hashes (never text) across the join."""
    d = load_table(spark, "documents", sf_dir)
    new = d.select(F.col("doc_id").alias("n_id"), F.md5(F.col("text").cast("binary")).alias("n_h"))
    old_mod = d.filter(F.col("doc_id") % 7 != 0).select(
        F.col("doc_id").alias("o_id"),
        F.md5(
            F.when(F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v1")))
            .otherwise(F.col("text"))
            .cast("binary")
        ).alias("o_h"),
    )
    old_del = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("o_id"),
        F.md5(F.col("text").cast("binary")).alias("o_h"),
    )
    old = old_mod.union(old_del)
    j = new.join(old, new.n_id == old.o_id, "full")
    status = (
        F.when(F.col("o_id").isNull(), "added")
        .when(F.col("n_id").isNull(), "deleted")
        .when(F.col("n_h") != F.col("o_h"), "updated")
        .otherwise("unchanged")
    )
    return j.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.coalesce("n_id", "o_id")).alias("min_id"),
        F.max(F.coalesce("n_id", "o_id")).alias("max_id"),
    )


@_q(
    "right_join_part_coverage",
    """
    SELECT p_brand,
           COUNT(*) AS n_rows,
           COUNT(l_orderkey) AS n_lineitems,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_uncovered_parts
    FROM (SELECT * FROM lineitem WHERE l_quantity > 48) l
    RIGHT JOIN part ON l.l_partkey = part.p_partkey
    GROUP BY p_brand
    """,
)
def right_join_part_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (§2C join-type checklist): every part is kept even
    with no matching (filtered) lineitem — the NULL-extended rows are
    observable as uncovered parts per brand."""
    l = load_table(spark, "lineitem", sf_dir).filter(F.col("l_quantity") > 48)
    p = load_table(spark, "part", sf_dir)
    return (
        l.join(p, l.l_partkey == p.p_partkey, "right")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("l_orderkey").alias("n_lineitems"),
            F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_uncovered_parts"),
        )
    )


@_q(
    "lateral_top_orders_per_customer",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_custkey < 200
    """,
)
def lateral_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row LIMIT (§2C join forms,
    via ``spark.sql`` like the reference's delegated path) — Catalyst
    decorrelates the per-customer top-2 into a window under the hood;
    the tie-break on o_orderkey makes the pick deterministic."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("_lat_customer")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM _lat_customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM _lat_orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey < 200
        """
    )


@_q(
    "unpivot_price_components",
    """
    SELECT l_orderkey, l_linenumber, 'price' AS component,
           l_extendedprice AS val
    FROM lineitem WHERE l_orderkey % 100 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey % 100 = 0
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax
    FROM lineitem WHERE l_orderkey % 100 = 0
    """,
)
def unpivot_price_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (§2C): wide price columns to long (component, val)
    rows via the native ``unpivot`` operator — one Expand node, one scan
    (vs the oracle's 3-scan UNION ALL formulation)."""
    l = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") % 100 == 0)
    return (
        l.withColumnRenamed("l_extendedprice", "price")
        .withColumnRenamed("l_discount", "discount")
        .withColumnRenamed("l_tax", "tax")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["price", "discount", "tax"],
            "component",
            "val",
        )
    )


@_q(
    "bitwise_function_gauntlet",
    """
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 4096 AS bor,
           xor(o_orderkey, o_custkey) AS bxor,
           ~o_orderkey AS bnot,
           o_orderkey << 3 AS shl,
           o_orderkey >> 2 AS shr,
           CAST(bit_count(o_orderkey) AS INTEGER) AS pop
    FROM orders
    """,
)
def bitwise_function_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface (§2C): and/or/xor/not, shifts, popcount —
    pure codegen'd projection (DuckDB's ``^`` is power, so the oracle uses
    ``xor()``; Spark's operators and the SQL forms agree on two's
    complement semantics)."""
    o = load_table(spark, "orders", sf_dir)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.col("o_custkey")).alias("bxor"),
        F.bitwise_not(k).alias("bnot"),
        F.shiftleft(k, 3).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
        F.bit_count(k).alias("pop"),
    )


@_q(
    "regex_like_filters",
    """
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%green%'
       OR p_type LIKE 'PROMO%'
       OR regexp_matches(p_name, '^[a-f]+ ')
    """,
)
def regex_like_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / prefix-LIKE / regexp predicate surface (§2C). Plan note: the
    OR-chain contains a non-source-convertible RLIKE, so the WHOLE
    disjunction evaluates post-scan (one whole-stage-codegen Filter — no
    partial pushdown of a disjunct is possible without changing
    semantics). AND-ed convertible predicates (see filter_scan_pushdown)
    are the shape that reaches the scan as PushedFilters."""
    p = load_table(spark, "part", sf_dir)
    return p.filter(
        F.col("p_name").like("%green%")
        | F.col("p_type").like("PROMO%")
        | F.col("p_name").rlike("^[a-f]+ ")
    ).select("p_partkey", "p_name", "p_type")


@_q(
    "null_safe_join_priorities",
    """
    WITH o AS (SELECT o_orderkey, nullif(o_orderpriority, '3-MEDIUM') AS prio
               FROM orders),
         d AS (SELECT nullif(p, '3-MEDIUM') AS prio, label
               FROM (VALUES ('1-URGENT', 'hot'), ('3-MEDIUM', 'warm'),
                            ('5-LOW', 'cold')) AS t(p, label))
    SELECT d.label, COUNT(*) AS n
    FROM o JOIN d ON o.prio IS NOT DISTINCT FROM d.prio
    GROUP BY d.label
    """,
)
def null_safe_join_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> ≙ IS NOT DISTINCT FROM, §2C): NULL
    keys MATCH each other, unlike plain equi-join semantics. The dim side
    is a 3-row literal frame — broadcast, so the null-safe condition stays
    a BroadcastHashJoin (Spark supports EqualNullSafe as a hash key)."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("prio")
    )
    d = spark.createDataFrame(
        [("1-URGENT", "hot"), ("3-MEDIUM", "warm"), ("5-LOW", "cold")], "p string, label string"
    ).select(F.nullif("p", F.lit("3-MEDIUM")).alias("prio"), "label")
    return (
        o.join(F.broadcast(d), o.prio.eqNullSafe(d.prio))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_q(
    "string_function_gauntlet",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substr(p_name, 1, 5) AS name_prefix,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           string_split(p_type, ' ')[1] AS type_head,
           replace(p_type, ' ', '_') AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_padded,
           concat_ws('|', p_brand, p_type) AS brand_type,
           reverse(p_name) AS name_rev
    FROM part
    """,
)
def string_function_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.split("p_type", " ").getItem(0).alias("type_head"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("size_padded"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.reverse("p_name").alias("name_rev"),
    )


@_q(
    "date_function_gauntlet",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dy,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(o_orderdate AS DATE) + 30 AS plus_30d,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(DATE '2002-01-01' - CAST(o_orderdate AS DATE) AS INTEGER) AS days_to_2002
    FROM orders
    """,
)
def date_function_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_add(d, 30).alias("plus_30d"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_2002"),
    )


@_q(
    "conditional_agg_pivot",
    f"""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
           {_osum('o_totalprice')} AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def conditional_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)

    def flag(status: str):
        return F.sum(F.when(F.col("o_orderstatus") == status, 1).otherwise(0))

    return o.groupBy("o_orderpriority").agg(
        flag("F").alias("n_f"),
        flag("O").alias("n_o"),
        flag("P").alias("n_p"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )


@_q(
    "salted_agg_orders",
    f"""
    SELECT o_orderstatus, COUNT(*) AS n, {_osum('o_totalprice')} AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def salted_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py) — must equal the
    plain GROUP BY bit-for-bit, which the decimal accumulation guarantees
    regardless of how the salt splits each key."""
    from cql_xmlpipe_spark.operators.skew import salted_agg

    o = load_table(spark, "orders", sf_dir)
    return salted_agg(
        o,
        keys=["o_orderstatus"],
        partial_aggs={
            "n": F.count(F.lit(1)),
            "total": F.sum(F.col("o_totalprice").cast(DEC)),
        },
        final_aggs={"n": F.sum("n"), "total": F.sum("total").cast("double")},
        n_salts=16,
    )


@_q(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS F,
           NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS O,
           NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True relational pivot (groupBy().pivot() with explicit values — the
    explicit list avoids the extra distinct-scan job). Spark emits NULL for
    empty cells; the oracle's NULLIF matches."""
    return (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )


@_q(
    "q4_order_priority_exists",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    l = load_table(spark, "lineitem", sf_dir).filter(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@_q(
    "json_extraction_events",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def json_extraction_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events.props string column."""
    e = load_table(spark, "events", sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.max(k).alias("max_k"), F.count(F.lit(1)).alias("n")
    )


@_q(
    "writetime_ttl_events",
    """
    SELECT event_id,
           epoch_us(ts) AS value_writetime,
           CASE WHEN (epoch_us(ts + INTERVAL 7 DAY)
                      - epoch_us(TIMESTAMP '2024-01-15 00:00:00')) > 0
                THEN (epoch_us(ts + INTERVAL 7 DAY)
                      - epoch_us(TIMESTAMP '2024-01-15 00:00:00')) // 1000000
           END AS value_ttl
    FROM events
    """,
)
def writetime_ttl_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 ``writetime()``/``ttl()`` emulation (SURVEY §2B): cell-metadata
    pseudo-columns derived as row-level sidecars — writetime(value) = µs of
    the event's last write (ts), ttl(value) = seconds remaining at a pinned
    as-of for a 7-day retention, NULL once expired (CQL 'no live TTL').
    Pure Column arithmetic over the scan — pruning/pushdown intact."""
    from cql_xmlpipe_spark.functions.cqlcompat import attach_cell_metadata, ttl, writetime

    e = load_table(spark, "events", sf_dir)
    e = attach_cell_metadata(
        e,
        write_time=F.col("ts"),
        ttl_expiry=F.col("ts") + F.expr("INTERVAL 7 DAYS"),
        # 2024-01-15T00:00:00Z as epoch millis — timestamp_millis is
        # session-tz-independent, unlike to_timestamp(string literal)
        # (same hazard class fixed for timeuuid bounds at the
        # timeuuid_window_filter_events plan below)
        as_of=F.timestamp_millis(F.lit(1705276800000)),
        cols=["value"],
    )
    return e.select(
        "event_id",
        writetime(e, "value").alias("value_writetime"),
        ttl(e, "value").alias("value_ttl"),
    )


#: 100ns intervals between the gregorian epoch and 1970-01-01 (RFC 4122)
_GREG = 122192928000000000


@_q(
    "timeuuid_roundtrip_events",
    f"""
    WITH t AS (SELECT event_id, epoch_ms(ts) AS ms FROM events),
         u AS (SELECT event_id, ms,
                      ms * 10000 + {_GREG} AS lo100,
                      ms * 10000 + 9999 + {_GREG} AS hi100
               FROM t)
    SELECT event_id,
           printf('%08x-%04x-1%03x-8080-808080808080',
                  lo100 & 4294967295, (lo100 >> 32) & 65535,
                  (lo100 >> 48) & 4095) AS min_tu,
           printf('%08x-%04x-1%03x-7f7f-7f7f7f7f7f7f',
                  hi100 & 4294967295, (hi100 >> 32) & 65535,
                  (hi100 >> 48) & 4095) AS max_tu,
           ms AS min_tu_ms, ms AS max_tu_ms, ms AS date_of_ms
    FROM u
    """,
)
def timeuuid_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 timeuuid family (``Query.java:250-258`` dialect surface):
    ``minTimeuuid``/``maxTimeuuid`` synthesis from each event's timestamp,
    then ``unixTimestampOf``/``dateOf`` extraction round-trips. The oracle
    rebuilds the v1-UUID string layout (RFC 4122 time_low/mid/hi split,
    gregorian 100ns offset, Cassandra's MIN/MAX clock-seq-and-node
    constants) independently via DuckDB printf/bit arithmetic, so both the
    uuid text and the embedded-ms extraction are cross-checked. Both
    extractions recover the source ms exactly (maxTimeuuid embeds
    remainder 9999, which floor-division shaves). Pure Column exprs."""
    from cql_xmlpipe_spark.functions.cqlcompat import (
        date_of,
        max_timeuuid,
        min_timeuuid,
        unix_timestamp_of,
    )

    e = load_table(spark, "events", sf_dir)
    mn = min_timeuuid(F.col("ts"))
    mx = max_timeuuid(F.col("ts"))
    return e.select(
        "event_id",
        mn.alias("min_tu"),
        mx.alias("max_tu"),
        unix_timestamp_of(mn).alias("min_tu_ms"),
        unix_timestamp_of(mx).alias("max_tu_ms"),
        F.unix_millis(date_of(mn)).alias("date_of_ms"),
    )


@_q(
    "timeuuid_window_filter_events",
    """
    SELECT event_type, COUNT(*) AS n,
           MIN(epoch_ms(ts)) AS first_ms,
           MAX(epoch_ms(ts)) AS last_ms
    FROM events
    WHERE epoch_ms(ts) BETWEEN epoch_ms(TIMESTAMP '2024-01-05 00:00:00')
                           AND epoch_ms(TIMESTAMP '2024-01-08 00:00:00')
    GROUP BY event_type
    """,
)
def timeuuid_window_filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 as the canonical CQL time-window predicate: ``t > minTimeuuid(x)
    AND t < maxTimeuuid(y)``. Each event's timeuuid is compared to the
    window bounds by embedded time (``unixTimestampOf``), which is how
    Cassandra orders timeuuids — NOT lexically (time_low is the most
    significant *string* position but the least significant time bits).
    ``unixTimestampOf(maxTimeuuid(ts))`` recovers epoch-ms exactly, so the
    oracle is plain ms arithmetic. Predicate is a pure Column expr over the
    scan (pushdown intact)."""
    from cql_xmlpipe_spark.functions.cqlcompat import (
        max_timeuuid,
        min_timeuuid,
        unix_timestamp_of,
    )

    e = load_table(spark, "events", sf_dir)
    tu = max_timeuuid(F.col("ts"))  # the row's timeuuid representative
    # timestamp_millis literals, NOT to_timestamp(string): string parsing
    # resolves in the session/JVM timezone while the DuckDB oracle's naive
    # TIMESTAMP literal is tz-independent — a non-UTC host would shift the
    # window. 1704412800000/1704672000000 = 2024-01-05/-08 00:00:00 UTC.
    lo = min_timeuuid(F.timestamp_millis(F.lit(1704412800000)))
    hi = max_timeuuid(F.timestamp_millis(F.lit(1704672000000)))
    ms = unix_timestamp_of(tu)
    return (
        e.filter(ms.between(unix_timestamp_of(lo), unix_timestamp_of(hi)))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.unix_millis(F.col("ts"))).alias("first_ms"),
            F.max(F.unix_millis(F.col("ts"))).alias("last_ms"),
        )
    )


#: 0xCAFEBABE00000000 reinterpreted as a signed big-endian long
_CAFE_SIGNED = (0xCAFEBABE00000000) - (1 << 64)


@_q(
    "blob_cast_gauntlet",
    f"""
    SELECT o_orderkey,
           o_orderkey AS okey_rt,
           (0 - o_orderkey - 1) AS neg_rt,
           lpad(to_hex(o_orderkey), 16, '0') AS okey_hex,
           to_hex(0 - o_orderkey - 1) AS neg_hex,
           CAST(o_custkey - 1000 AS INTEGER) AS int_rt,
           o_orderpriority AS txt_rt,
           hex(encode(o_orderpriority)) AS txt_hex,
           CAST({_CAFE_SIGNED} AS BIGINT) AS lit_bigint
    FROM orders
    """,
)
def blob_cast_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 ``blobAsX``/``XAsBlob`` (Cassandra 2.1 dialect, ``pom.xml``
    driver): signed big-endian reinterpretation round-trips for bigint
    (positive AND negative — the high-bit case that breaks unsigned conv),
    int (two's-complement within 32 bits, negatives via custkey-1000),
    text (utf-8), plus the raw hex rendering of each blob and a constant
    high-bit blob literal. The oracle reproduces the byte images with
    DuckDB to_hex/encode — an independent big-endian witness."""
    from cql_xmlpipe_spark.functions.cqlcompat import (
        bigint_as_blob,
        blob_as_bigint,
        blob_as_int,
        blob_as_text,
        int_as_blob,
        text_as_blob,
    )

    o = load_table(spark, "orders", sf_dir)
    okey = F.col("o_orderkey").cast("long")
    neg = (-okey - F.lit(1)).cast("long")
    return o.select(
        "o_orderkey",
        blob_as_bigint(bigint_as_blob(okey)).alias("okey_rt"),
        blob_as_bigint(bigint_as_blob(neg)).alias("neg_rt"),
        F.hex(bigint_as_blob(okey)).alias("okey_hex"),
        F.hex(bigint_as_blob(neg)).alias("neg_hex"),
        blob_as_int(int_as_blob((F.col("o_custkey") - F.lit(1000)).cast("int"))).alias(
            "int_rt"
        ),
        blob_as_text(text_as_blob(F.col("o_orderpriority"))).alias("txt_rt"),
        F.hex(text_as_blob(F.col("o_orderpriority"))).alias("txt_hex"),
        blob_as_bigint(F.unhex(F.lit("CAFEBABE00000000"))).alias("lit_bigint"),
    )


@_q(
    "array_functions_gauntlet",
    """
    WITH t AS (SELECT p_partkey, string_split(p_type, ' ') AS toks FROM part)
    SELECT p_partkey,
           array_to_string(list_sort(toks), ',') AS toks_sorted,
           list_contains(toks, 'BRUSHED') AS has_brushed,
           coalesce(array_to_string(list_slice(toks, 2, 3), ','), '') AS mid,
           CAST(len(toks) AS INTEGER) AS n_toks,
           list_min(toks) AS tok_min,
           array_to_string(list_concat(toks, ['x']), ',') AS appended
    FROM t
    """,
)
def array_functions_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function library over split p_type tokens (sort, contains,
    slice, join, min, concat). Array-typed intermediates are exercised in
    full; the OUTPUT columns are rendered to strings (array_join) because
    the driver's canonicalizer sorts result columns with pandas, which
    cannot hash list values (CORRECTNESS_r01: 'unhashable type: list')."""
    p = load_table(spark, "part", sf_dir)
    toks = F.split("p_type", " ")
    return p.select(
        "p_partkey",
        F.array_join(F.sort_array(toks), ",").alias("toks_sorted"),
        F.array_contains(toks, "BRUSHED").alias("has_brushed"),
        F.array_join(F.slice(toks, 2, 2), ",").alias("mid"),
        F.size(toks).alias("n_toks"),
        F.array_min(toks).alias("tok_min"),
        F.array_join(F.concat(toks, F.array(F.lit("x"))), ",").alias("appended"),
    )


@_q(
    "correlated_scalar_subquery",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each customer's max-price order(s) via a correlated scalar subquery
    issued through ``spark.sql`` — exercises Catalyst decorrelation (the
    §2B delegated path: SQL text in, optimized plan out)."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("_csq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM _csq_orders o
        WHERE o_totalprice = (SELECT MAX(o2.o_totalprice) FROM _csq_orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


@_q(
    "grouping_sets_lineitem",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {_osum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) through spark.sql."""
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@_q(
    "sortmerge_join_revenue",
    f"""
    SELECT o_orderpriority, {_osum('l_extendedprice')} AS revenue, COUNT(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def sortmerge_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big join pinned to sort-merge via the MERGE hint — the physical
    strategy a 100 TB fact-fact join must take (broadcast is impossible;
    plan assertion in tests/test_plans.py)."""
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        l.hint("merge")
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@_q(
    "udtf_sentence_split",
    r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(list_transform(string_split_regex(text, '[.!?]'),
                         x -> trim(x, ' ' || chr(9) || chr(10) || chr(13))),
                         x -> x <> '') AS sents
      FROM documents),
    e AS (SELECT doc_id,
                 unnest(list_transform(range(1, len(sents)+1),
                        i -> {'idx': CAST(i AS INT), 'sentence': sents[i]})) AS u
          FROM s)
    SELECT doc_id, u.idx AS idx, u.sentence AS sentence FROM e
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+ table function) in a LATERAL join: 1→N
    sentence expansion per document."""
    from cql_xmlpipe_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.idx, s.sentence
        FROM _udtf_docs d, LATERAL split_sentences(d.text) s
        """
    )


# murmur3 tokens are engine-native (no DuckDB analogue) — rows-only check;
# the two independent implementations cross-validate in tests/test_cqlcompat.py
#: B9 pinned-fixture oracle: partitioner tokens are not expressible in
#: DuckDB SQL, so the ground truth is a parquet fixture precomputed by the
#: PURE-PYTHON scalar model (scripts/make_murmur3_fixture.py — a separate
#: implementation from the vectorized numpy batch the query runs), itself
#: pinned to public vectors (h1("foo") and Cassandra token(int 1)) before
#: generation. Keys 0..149999 cover every testdata sf; the join keeps the
#: oracle sf-agnostic.
import os as _os

_MURMUR3_FIXTURE = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    "tests", "fixtures", "murmur3_tokens_orders.parquet",
)

@_q(
    "token_orders_murmur3",
    f"""
    SELECT o.o_orderkey, f.token
    FROM orders o
    JOIN read_parquet('{_MURMUR3_FIXTURE}') f USING (o_orderkey)
    """,
)
def token_orders_murmur3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 ``token(pk)`` with Cassandra Murmur3Partitioner parity: h1 of
    MurmurHash3_x64_128 (seed 0) over the protocol-serialized key,
    including the Java port's signed-tail composition. Vectorized Arrow
    batch — one Python boundary, no per-row loop."""
    from pyspark.sql import types as T

    from cql_xmlpipe_spark.functions.murmur3 import cassandra_token

    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        cassandra_token(F.col("o_orderkey"), T.LongType()).alias("token"),
    )


@_q(
    "udaf_weighted_avg_price",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0
             AS w_avg_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas grouped-agg UDAF (§2C UDF/UDAF surface), two-level so it
    survives 100×: a grouped-agg pandas UDF has NO partial aggregation —
    fed raw rows it would stream each return flag's entire slice (~⅓ of
    lineitem) through one Python worker. Level 1 therefore pre-aggregates
    int64 partials (cents×qty, qty, count) per (l_returnflag, salt) with
    BUILT-IN sums — map-side combine + a shuffle of ≤ 3×64 fixed-width
    rows — and only those partials cross the Python boundary, where the
    UDAF combines them. Exactness discipline for the cross-engine hash
    gate: prices are 2-dp decimals, so level 1 accumulates integer CENTS
    × integer quantities in int64 (summation-order-independent; the
    salt does not affect the total) and the UDAF divides once at the
    end, mirroring the oracle's BIGINT arithmetic bit-for-bit. At larger
    scales raise the salt count so per-partial int64 stays in range
    (cents×qty ≈ 5e8/row ⇒ ~1.8e10 rows per (flag, salt) before
    overflow)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: this module uses `from __future__
    # import annotations`, which stringifies type hints and defeats
    # pandas_udf's signature inference
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wavg_combine(cents_qty, qty):
        return float(cents_qty.sum()) / float(qty.sum()) / 100.0

    # Spark disallows mixing pandas and JVM aggregates in one Aggregate
    # node (INVALID_PANDAS_UDF_PLACEMENT) — the row count is a second
    # pandas aggregate riding the same Arrow batch
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def count_combine(cnt):
        return int(cnt.sum())

    l = load_table(spark, "lineitem", sf_dir)
    partials = l.groupBy(
        "l_returnflag",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(64)).alias("salt"),
    ).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * F.col("l_quantity").cast("long")
        ).alias("cents_qty"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return partials.groupBy("l_returnflag").agg(
        wavg_combine("cents_qty", "qty").alias("w_avg_price"),
        count_combine("cnt").alias("n"),
    )


@_q(
    "grouped_map_rank_lineitems",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY l_returnflag
             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
             AS BIGINT) AS price_rank
    FROM lineitem
    WHERE l_extendedprice > 90000
    """,
)
def grouped_map_rank_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (§2C UDF surface): per-group custom
    pandas logic — dense price ranking with a total tie-break, identical
    to the window-function oracle. Integer output, stable sort, unique
    keys ⇒ deterministic across engines and partitionings. The group key
    shuffles once; each group's frame arrives as ONE Arrow batch (the
    documented constraint: a single group must fit an executor's memory —
    here groups are bounded by the filter)."""
    import pandas as pd

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True],
            kind="mergesort",
        )
        pdf["price_rank"] = range(1, len(pdf) + 1)
        return pdf[["l_returnflag", "l_orderkey", "l_linenumber", "price_rank"]]

    l = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_extendedprice") > 90000)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    )
    return l.groupBy("l_returnflag").applyInPandas(
        rank_group,
        schema="l_returnflag string, l_orderkey long, l_linenumber long, price_rank long",
    )


# ---------------------------------------------------------------------------
# as-of / range joins (custom temporal operators, operators/asof.py)
# ---------------------------------------------------------------------------


@_q(
    "asof_join_purchase_click",
    """
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts, MAX(value) AS click_value FROM events
          WHERE event_type = 'click' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
           c.click_value AS r_click_value, epoch_us(c.ts) AS r_ts_us
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined to the user's most recent click at-or-before it
    (union + ordered-window as-of join — one shuffle, no theta-join
    blowup). DuckDB's native ASOF JOIN is the oracle."""
    from cql_xmlpipe_spark.operators.asof import asof_join

    e = load_table(spark, "events", sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    joined = asof_join(p, c, on=["user_id"], left_ts="ts", right_ts="ts")
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        "r_click_value",
        F.unix_micros("r_ts").alias("r_ts_us"),
    )


@_q(
    "asof_join_forward_click",
    """
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts, MAX(value) AS click_value FROM events
          WHERE event_type = 'click' GROUP BY user_id, ts)
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
           c.click_value AS r_click_value, epoch_us(c.ts) AS r_ts_us
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def asof_join_forward_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase attaches the user's EARLIEST
    click at-or-after it (direction='forward' flips the window to
    first-over-following — same single-shuffle cost profile as backward).
    Oracle: DuckDB ASOF with the <= inequality."""
    from cql_xmlpipe_spark.operators.asof import asof_join

    e = load_table(spark, "events", sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    joined = asof_join(p, c, on=["user_id"], left_ts="ts", right_ts="ts", direction="forward")
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        "r_click_value",
        F.unix_micros("r_ts").alias("r_ts_us"),
    )


@_q(
    "range_join_price_bands",
    f"""
    WITH bands(band, lo, hi) AS (VALUES
      ('budget', 0.0, 100000.0), ('mid', 100000.0, 250000.0),
      ('high', 250000.0, 400000.0), ('premium', 400000.0, 1e18))
    SELECT band, COUNT(*) AS n_orders, {_osum('o_totalprice')} AS total_price
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast range join: each order finds its price band via an
    inequality join against a 4-row broadcast dim (plans as
    BroadcastNestedLoopJoin — the right physical strategy here)."""
    from cql_xmlpipe_spark.operators.asof import range_join_bands

    o = load_table(spark, "orders", sf_dir)
    bands = spark.createDataFrame(
        [
            ("budget", 0.0, 100000.0),
            ("mid", 100000.0, 250000.0),
            ("high", 250000.0, 400000.0),
            ("premium", 400000.0, 1e18),
        ],
        "band string, lo double, hi double",
    )
    return (
        range_join_bands(o, bands, "o_totalprice")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# event-time processing (batch twins of the streaming operators)
# ---------------------------------------------------------------------------


@_q(
    "interval_join_purchase_clicks",
    """
    SELECT p.user_id, p.event_id AS purchase_id, epoch_us(p.ts) AS p_ts_us,
           p.value AS purchase_value, c.event_id AS click_id,
           epoch_us(c.ts) AS c_ts_us
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 15 MINUTE
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def interval_join_purchase_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join (streaming/joins.py):
    purchases × same-user clicks within a 15-minute lookback."""
    from cql_xmlpipe_spark.streaming.joins import purchases_with_recent_clicks

    return purchases_with_recent_clicks(load_table(spark, "events", sf_dir))


@_q(
    "events_tumbling_window",
    f"""
    SELECT event_type,
           CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_start,
           COUNT(*) AS n_events,
           {_osum('value')} AS sum_value
    FROM events GROUP BY event_type, bucket_start
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy("event_type", F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("sum_value"))
        .select(
            "event_type",
            F.col("w.start").cast("timestamp").cast("long").alias("bucket_start"),
            "n_events",
            "sum_value",
        )
    )


_STREAM_TWIN_SEQ = 0


@_q(
    "streaming_tumbling_window",
    f"""
    SELECT event_type,
           CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_start,
           COUNT(*) AS n_events,
           {_osum('value')} AS sum_value
    FROM events GROUP BY event_type, bucket_start
    """,
)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING tumbling-window path, driver-visible: readStream over
    the events table → watermarked event-time window aggregate
    (``streaming/windows.py``) → ``trigger(availableNow=True)`` into a
    memory sink, result returned as the sink table. Same oracle as the
    batch twin ``events_tumbling_window`` — the gate checks the Structured
    Streaming execution itself, not a batch re-expression. Running a
    bounded stream to completion requires an eager action by construction
    (the same documented exception as the connected-components loop)."""
    from cql_xmlpipe_spark.streaming.sources import stream_events
    from cql_xmlpipe_spark.streaming.windows import tumbling_window_counts

    global _STREAM_TWIN_SEQ
    _STREAM_TWIN_SEQ += 1
    name = f"streaming_tumbling_window_{_STREAM_TWIN_SEQ}"
    q = (
        tumbling_window_counts(stream_events(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError("streaming twin did not finish in 300s")
    finally:
        q.stop()
    return spark.table(name)


@_q(
    "streaming_sliding_window",
    f"""
    WITH s AS (
      SELECT event_type, value,
             unnest([CAST(floor(epoch(ts) / 300) * 300 AS BIGINT),
                     CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT)])
               AS bucket_start
      FROM events)
    SELECT event_type, bucket_start,
           bucket_start + 600 AS bucket_end,
           COUNT(*) AS n_events,
           {_osum('value')} AS sum_value
    FROM s GROUP BY event_type, bucket_start
    """,
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING sliding-window path (10-minute windows every 5
    minutes), driver-visible — the one 2C streaming shape the r12
    verdict noted had pytest coverage but no gate row. readStream →
    watermarked overlapping-window aggregate
    (``streaming/windows.py::sliding_window_counts``) →
    ``trigger(availableNow=True)`` into a memory sink. Oracle: every
    event belongs to exactly window/slide = 2 windows, whose starts are
    the two 300 s grid points in (ts−600 s, ts] — enumerated per event
    with unnest, then the same exact-decimal value sum as the tumbling
    twin."""
    from cql_xmlpipe_spark.streaming.sources import stream_events
    from cql_xmlpipe_spark.streaming.windows import sliding_window_counts

    global _STREAM_TWIN_SEQ
    _STREAM_TWIN_SEQ += 1
    name = f"streaming_sliding_window_{_STREAM_TWIN_SEQ}"
    q = (
        sliding_window_counts(stream_events(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError("streaming sliding twin did not finish in 300s")
    finally:
        q.stop()
    return spark.table(name)


@_q(
    "streaming_session_window",
    """
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) > 600000000
                  OR LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, us,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM t)
    SELECT user_id, COUNT(*) AS n_events,
           MIN(us) AS session_start_us, MAX(us) AS session_end_us
    FROM s GROUP BY user_id, session_id
    """,
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STATEFUL streaming path, driver-visible: readStream →
    ``session_window`` aggregation (``streaming/windows.py`` — merging
    session state, not a fixed window grid) → availableNow into a memory
    sink. Oracle = the batch ``events_sessionize`` lag/cumsum semantics
    (same 10-minute gap), projected without the ordinal session_id the
    native session window doesn't carry. Spark's ``session_window.end``
    is last-event + gap, so the gap is subtracted to recover the max
    event time. Complete mode: correct for a bounded gate run — append
    mode can never emit a bounded stream's final sessions (their end
    exceeds any reachable watermark); on a real stream use append +
    watermark and accept the lateness SLA (SCALE.md)."""
    from cql_xmlpipe_spark.streaming.sources import stream_events
    from cql_xmlpipe_spark.streaming.windows import session_window_stats

    global _STREAM_TWIN_SEQ
    _STREAM_TWIN_SEQ += 1
    name = f"streaming_session_window_{_STREAM_TWIN_SEQ}"
    q = (
        session_window_stats(stream_events(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError("streaming session twin did not finish in 300s")
    finally:
        q.stop()
    return spark.table(name).select(
        "user_id",
        "n_events",
        "session_start_us",
        (F.col("session_end_us") - 600_000_000).alias("session_end_us"),
    )


@_q(
    "streaming_session_window_append",
    """
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) > 600000000
                  OR LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, us,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM t),
    sess AS (
      SELECT user_id, COUNT(*) AS n_events,
             MIN(us) AS session_start_us, MAX(us) AS session_end_us
      FROM s GROUP BY user_id, session_id),
    wm AS (SELECT ((MAX(epoch_us(ts)) // 1000) - 3600000) * 1000 AS w
           FROM events)
    SELECT user_id, n_events, session_start_us, session_end_us
    FROM sess, wm WHERE session_end_us + 600000000 < wm.w
    """,
)
def streaming_session_window_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION session-window plan: readStream → ``session_window``
    → **append mode with a 1-hour watermark** → availableNow into a
    memory sink. Unlike the complete-mode gate twin (whose state carries
    every user forever — the bounded-gate trade recorded in SCALE.md),
    append emits each session once when the watermark passes its end and
    EVICTS its state — the unbounded-stream shape where state holds only
    open sessions inside the lateness SLA.

    Emission semantics pinned empirically (and modeled in the oracle):
    Spark truncates the watermark to milliseconds (event-time stats
    collect µs//1000) and finalizes strictly — a session whose
    window end (last event + gap) equals the watermark is NOT emitted.
    So the oracle is the batch lag/cumsum sessionization restricted to
    sessions with end + gap < (max_ts_ms - 1 h)·1000: on a bounded
    replay the final sessions stay in state by construction (their end
    exceeds any reachable watermark); the complete-mode twin covers
    them. Gate corpora stage as ONE file → one data micro-batch → no
    event can be late; on a multi-file stream the 1-hour delay is the
    real lateness SLA, with Spark's exact two-watermark semantics
    (SPARK-42931, empirically pinned in tests/test_streaming.py::
    test_session_window_append_late_data_semantics): late-event
    FILTERING uses the previous batch's watermark (so a one-batch lag
    lets a nominally-late row still merge into open state), while state
    EVICTION uses the current one — a truly-late row is dropped and can
    never resurrect an already-emitted session as a duplicate append
    row. ``session_end_us`` is last-event time (gap subtracted),
    matching the complete twin."""
    from cql_xmlpipe_spark.streaming.sources import stream_events
    from cql_xmlpipe_spark.streaming.windows import session_window_stats

    global _STREAM_TWIN_SEQ
    _STREAM_TWIN_SEQ += 1
    name = f"streaming_session_window_append_{_STREAM_TWIN_SEQ}"
    q = (
        session_window_stats(
            stream_events(spark, sf_dir), gap="10 minutes", watermark="1 hour"
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError("streaming append twin did not finish in 300s")
    finally:
        q.stop()
    return spark.table(name).select(
        "user_id",
        "n_events",
        "session_start_us",
        (F.col("session_end_us") - 600_000_000).alias("session_end_us"),
    )


@_q(
    "streaming_watermark_dedup",
    """
    SELECT DISTINCT user_id, event_type,
           CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS hour_start
    FROM events
    """,
)
def streaming_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming DEDUP state path, driver-visible: readStream →
    ``dropDuplicatesWithinWatermark`` (``streaming/dedup.py``) →
    availableNow into a memory sink. Key = (user, type, hour bucket) —
    the at-least-once collapse a telemetry pipeline runs; only the key
    columns are emitted, so the survivor row is deterministic (whole-row
    survivors under streaming dedup are arrival-order-dependent) and the
    oracle is a plain DISTINCT. The corpus carries real duplicates at
    every gate sf (6/92/942 at sf0.001/0.01/0.1), so the drop path
    executes. Watermark horizon 35 days > the corpus's 30-day span: in a
    bounded replay no key state may expire mid-run or replayed late rows
    could re-emit their key (nondeterministic vs the oracle). On a real
    unbounded stream the horizon is the dedup SLA — state stays bounded
    because keys expire once the watermark passes (SCALE.md)."""
    from cql_xmlpipe_spark.streaming.dedup import dedup_stream
    from cql_xmlpipe_spark.streaming.sources import stream_events

    global _STREAM_TWIN_SEQ
    _STREAM_TWIN_SEQ += 1
    name = f"streaming_watermark_dedup_{_STREAM_TWIN_SEQ}"
    keyed = stream_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        "ts",
        (F.floor(F.col("ts").cast("long") / 3600) * 3600)
        .cast("long")
        .alias("hour_start"),
    )
    deduped = dedup_stream(
        keyed,
        keys=("user_id", "event_type", "hour_start"),
        watermark="35 days",
    ).select("user_id", "event_type", "hour_start")
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError("streaming dedup twin did not finish in 300s")
    finally:
        q.stop()
    return spark.table(name)


@_q(
    "streaming_user_profile_state",
    """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(round_even(value * 100, 0) AS BIGINT)) AS BIGINT)
             AS sum_value_cents,
           MAX(epoch_us(ts)) AS last_seen_us,
           CAST(COUNT(DISTINCT event_type) AS INTEGER) AS n_event_types
    FROM events GROUP BY user_id
    """,
)
def streaming_user_profile_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ARBITRARY-STATE streaming API (``applyInPandasWithState``),
    driver-visible: readStream → per-user running profile
    (``streaming/stateful.py``) → availableNow into a memory sink. This
    is the one streaming path the built-in windowed aggregates cannot
    express — custom state schema, custom merge logic — previously
    pytest-only. Determinism across trigger boundaries comes from the
    state design: the value sum accumulates PER-ROW integer cents
    (pandas round() is half-even; the oracle says round_even), last-seen
    is a max, and event types a set — all order- and batch-independent.
    Each user may emit once per micro-batch it appears in (update mode),
    so the gate takes the FINAL emission per user: n_events grows
    monotonically, making max(n_events) the last state — a deterministic
    selector, not an arrival-order survivor. At scale state is O(users)
    on the key-partitioned executors and the memory sink swaps for a
    compacted topic/table keyed by user."""
    from pyspark.sql import Window

    from cql_xmlpipe_spark.streaming.sources import stream_events
    from cql_xmlpipe_spark.streaming.stateful import running_user_stats

    global _STREAM_TWIN_SEQ
    _STREAM_TWIN_SEQ += 1
    name = f"streaming_user_profile_{_STREAM_TWIN_SEQ}"
    profiles = running_user_stats(stream_events(spark, sf_dir))
    q = (
        profiles.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError("stateful profile twin did not finish in 300s")
    finally:
        q.stop()
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        spark.table(name)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@_q(
    "events_sliding_window",
    f"""
    WITH e AS (
      SELECT event_type, value,
             unnest([CAST(floor(epoch(ts) / 300) * 300 AS BIGINT),
                     CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT)])
               AS bucket_start
      FROM events)
    SELECT event_type, bucket_start, COUNT(*) AS n_events,
           {_osum('value')} AS sum_value
    FROM e GROUP BY event_type, bucket_start
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min window / 5 min slide): every event lands in
    two overlapping buckets. Batch twin of streaming sliding_window_counts;
    the oracle replicates the window-assignment rule by exploding each
    event into its two bucket starts."""
    e = load_table(spark, "events", sf_dir)
    return (
        e.groupBy("event_type", F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(F.col("value")).alias("sum_value"))
        .select(
            "event_type",
            F.col("w.start").cast("long").alias("bucket_start"),
            "n_events",
            "sum_value",
        )
    )


@_q(
    "events_sessionize",
    """
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) > 600000000
                  OR LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, us,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM t)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(us) AS session_start_us, MAX(us) AS session_end_us
    FROM s GROUP BY user_id, session_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (10-minute inactivity) via the lag/cumsum
    device — operators/sessionize.py::sessionize, one window exchange on
    user_id."""
    from cql_xmlpipe_spark.operators.sessionize import sessionize

    return sessionize(load_table(spark, "events", sf_dir))


@_q(
    "events_sessionize_bucketed",
    """
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) > 600000000
                  OR LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, us,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM t)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(us) AS session_start_us, MAX(us) AS session_end_us
    FROM s GROUP BY user_id, session_id
    """,
)
def events_sessionize_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKEW-HARDENED sessionization plan (r12 verdict task 3) under
    the IDENTICAL oracle as ``events_sessionize``: pre-bucket the window
    key to (user, day), sessionize locally, then stitch per-user session
    SUMMARIES across bucket cuts (operators/sessionize.py::
    sessionize_bucketed) — same output to the row, including session_id
    ordinals, but no single hot user can serialize one window task. The
    one-user-with-10%-of-events hazard measurement is in SCALE.md."""
    from cql_xmlpipe_spark.operators.sessionize import sessionize_bucketed

    return sessionize_bucketed(load_table(spark, "events", sf_dir))


# ---------------------------------------------------------------------------
# §2C statistical aggregates — moments, percentiles, mode
# ---------------------------------------------------------------------------
# Determinism strategy: never use the engines' own stddev/corr (their
# streaming accumulation is summation-order-dependent in the last ulps).
# Instead both sides aggregate exact DECIMAL(30,8) raw sums (x, x², y, y²,
# xy are all exactly representable: l_quantity is integer-valued,
# l_extendedprice has 2 decimals, so every product has ≤4 decimals) and
# then evaluate the SAME closed-form double expression on those sums —
# IEEE 754 ops on identical inputs in identical order are bit-identical
# cross-engine. At 100 TB this is also the right execution shape: one
# codegen'd partial+final hash aggregate of six fused sums, no second pass.


@_q(
    "stats_moments_lineitem",
    f"""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             {_osum('l_quantity')} AS sx,
             {_osum('l_quantity * l_quantity')} AS sxx,
             {_osum('l_extendedprice')} AS sy,
             {_osum('l_extendedprice * l_extendedprice')} AS syy,
             {_osum('l_quantity * l_extendedprice')} AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           ROUND((sxx - sx * sx / n) / (n - 1.0), 6) AS var_samp_qty,
           ROUND(sqrt((sxx - sx * sx / n) / (n - 1.0)), 6) AS stddev_samp_qty,
           ROUND((sxx - sx * sx / n) / n, 6) AS var_pop_qty,
           ROUND((sxy - sx * sy / n) / (n - 1.0), 6) AS covar_samp_qty_price,
           ROUND((sxy - sx * sy / n)
             / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS corr_qty_price
    FROM s
    """,
)
def stats_moments_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance / stddev / covariance / correlation per return flag, from
    exact decimal raw moments (see block comment above for why not the
    built-in stddev/corr)."""
    l = load_table(spark, "lineitem", sf_dir)
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum(x * x).alias("sxx"),
        dsum(y).alias("sy"),
        dsum(y * y).alias("syy"),
        dsum(x * y).alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sy", "syy", "sxy"))
    # round(…, 6): the closed forms are deterministic per engine, but one
    # engine may contract a*b+c into an FMA — observed a 1-ulp divergence
    # on corr at sf0.001. 6 dp is ~7 orders above the ulp noise floor.
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        F.round((sxx - sx * sx / n) / (n - F.lit(1.0)), 6).alias("var_samp_qty"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - F.lit(1.0))), 6).alias("stddev_samp_qty"),
        F.round((sxx - sx * sx / n) / n, 6).alias("var_pop_qty"),
        F.round((sxy - sx * sy / n) / (n - F.lit(1.0)), 6).alias("covar_samp_qty_price"),
        F.round(
            (sxy - sx * sy / n)
            / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
            6,
        ).alias("corr_qty_price"),
    )


@_q(
    "percentile_quantity_by_flag",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75,
           quantile_cont(l_quantity, 0.90) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def percentile_quantity_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of l_quantity per return flag.

    Bit-exact cross-engine because l_quantity is integer-valued and the
    (n-1)*p rank fractions are dyadic (0.25/0.5/0.75 steps), so the linear
    interpolation is exactly representable regardless of which of the two
    algebraically-equal interpolation forms each engine uses. Spark plans
    a single sort-based aggregate; at scale prefer approx_percentile
    (recorded in ``approx_distinct_parts``'s family) when exactness isn't
    contractual."""
    l = load_table(spark, "lineitem", sf_dir)
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
        F.percentile("l_quantity", F.lit(0.90)).alias("p90"),
    )


@_q(
    "mode_orderpriority_by_status",
    """
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      FROM orders GROUP BY o_orderstatus, o_orderpriority),
    r AS (
      SELECT o_orderstatus, o_orderpriority, cnt,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY cnt DESC, o_orderpriority) AS rn
      FROM c)
    SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS mode_count
    FROM r WHERE rn = 1
    """,
)
def mode_orderpriority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: top-1 by (count DESC, value ASC) — the built-in
    ``mode()`` leaves ties unspecified in both engines, so the tiebreak is
    explicit. Two codegen'd hash aggregates + a tiny window; the heavy
    lifting is the first map-side-combined count."""
    o = load_table(spark, "orders", sf_dir)
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy("o_orderstatus").orderBy(F.col("cnt").desc(), "o_orderpriority")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").alias("mode_count"),
        )
    )


# ---------------------------------------------------------------------------
# §2C map functions, deterministic sampling, q18
# ---------------------------------------------------------------------------


@_q(
    "map_functions_gauntlet",
    """
    SELECT o_orderkey,
           o_orderstatus AS status,
           CAST(3 AS INTEGER) AS n_entries,
           'bucket|priority|status' AS keys_sorted,
           array_to_string(list_sort([o_orderstatus, o_orderpriority,
             CASE WHEN o_totalprice > 150000 THEN 'hi' ELSE 'lo' END]),
             '|') AS values_sorted,
           upper(CASE WHEN o_totalprice > 150000 THEN 'hi' ELSE 'lo' END)
             AS bucket_upper,
           CAST(2 AS INTEGER) AS n_nonstatus
    FROM orders
    """,
)
def map_functions_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function library: create_map / map_concat / element_at /
    map_keys / map_values / transform_values / map_filter. The oracle
    computes the same VALUES without maps (DuckDB's map surface differs),
    so it checks results, not mechanism — same stance as the sdbm oracle.
    All map ops are codegen'd Column expressions; nothing leaves the JVM."""
    o = load_table(spark, "orders", sf_dir)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    bucket = F.when(F.col("o_totalprice") > 150000, "hi").otherwise("lo")
    merged = F.map_concat(m, F.create_map(F.lit("bucket"), bucket))
    return o.select(
        "o_orderkey",
        F.element_at(m, F.lit("status")).alias("status"),
        F.size(merged).alias("n_entries"),
        F.array_join(F.sort_array(F.map_keys(merged)), "|").alias("keys_sorted"),
        F.array_join(F.sort_array(F.map_values(merged)), "|").alias("values_sorted"),
        F.element_at(
            F.transform_values(merged, lambda _, v: F.upper(v)), F.lit("bucket")
        ).alias("bucket_upper"),
        F.size(
            F.map_filter(merged, lambda k, _: k != F.lit("status"))
        ).alias("n_nonstatus"),
    )


@_q(
    "deterministic_sample_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def deterministic_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~12.5% sample by hashing the key (first md5 hex char in
    {0,1}) — the sampling primitive a training-data pipeline needs: stable
    across engines, runs, and partitionings, unlike TABLESAMPLE/rand(seed)
    which are partition-layout-dependent. At 100 TB this is a pure narrow
    filter (no shuffle) and the md5 never leaves codegen."""
    o = load_table(spark, "orders", sf_dir)
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@_q(
    "q18_large_volume_customer",
    f"""
    SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           o_totalprice, {_osum('l_quantity')} AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over a HAVING aggregate, then a
    3-way join + regroup. Catalyst plans the IN as a left-semi join whose
    build side is the aggregated key set; at scale the semi join prunes
    lineitem before the wide join, so the expensive shuffle carries only
    qualifying orders."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("s"))
        .filter(F.col("s") > 250)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_custkey", "o_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"), "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
    )

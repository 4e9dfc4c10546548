"""TPC-H classics over the driver's star schema — the general-analytics
face of the engine (SURVEY §5: the TPC-H-ish tables are the stand-in
corpus; the reference itself has no generic query surface, SURVEY §2.1).
Q1/Q3/Q5/Q6 shapes adapted to the columns present (no commit/receipt
dates; o_orderpriority stands in for o_shippriority).

Money determinism: every price/discount/tax is cent-valued at source, so
each is extracted ONCE as an exact integer (ROUND(x*100)) and all revenue
arithmetic stays in pure int64 — `extprice*(1-disc)` becomes
`ep_c*(100-d_c)` at 1e4 scale, `*(1+tax)` appends `*(100+t_c)` at 1e6.
No double ever crosses a shuffle, so Spark and DuckDB agree bit-for-bit;
the reported averages are single divisions of exact integers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


@register(
    "tpch_q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                        * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS BIGINT) AS sum_charge_e6,
               CAST(COUNT(*) AS BIGINT) AS count_order,
               CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "agg", "headline"),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: one scan, map-side partial agg, one shuffle on
    the 6-group key — the canonical whole-stage-codegen aggregate."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    ep, dc, tx = _cents("l_extendedprice"), _cents("l_discount"), _cents("l_tax")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.sum(ep).alias("sum_base_cents"),
        F.sum(ep * (F.lit(100) - dc)).alias("sum_disc_e4"),
        F.sum(ep * (F.lit(100) - dc) * (F.lit(100) + tx)).alias("sum_charge_e6"),
        F.count(F.lit(1)).alias("count_order"),
        (F.sum("l_quantity").cast("double") / F.count(F.lit(1))).alias("avg_qty"),
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
                   AS revenue_e4,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue_e4 DESC, l_orderkey ASC
        LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: the filtered customer side joins into
    orders, the join result shuffles once on orderkey for the revenue
    agg, and the top-10 is a TakeOrderedAndProject (no full sort).
    Deterministic LIMIT via the orderkey tiebreak."""
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(ep * (F.lit(100) - dc)).alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue_e4",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
                   AS revenue_e4
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    tags=("tpch", "join", "headline"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local supplier volume: the 6-table join. nation x region
    collapse driver-free into a broadcast filter; customer and supplier
    are data-proportional, so their broadcast is planner-chosen (taken
    at test scale); lineitem x orders is the one real shuffle join (on
    orderkey). Catalyst reorders the filters into the scans — the plan a
    hand-written optimizer would pick, for free."""
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey)
            & (cust.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(ep * (F.lit(100) - dc)).alias("revenue_e4"))
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
                   AS revenue_e4,
               CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_cents
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal
        ORDER BY revenue_e4 DESC, c_custkey ASC
        LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: quarter-filtered orders join returned
    lineitems (one shuffle on orderkey), customer joins (planner-chosen
    broadcast at test scale) for the
    final enrichment, top-20 via TakeOrderedAndProject with a custkey
    tiebreak."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(F.sum(ep * (F.lit(100) - dc)).alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue_e4",
            _cents("c_acctbal").alias("acctbal_cents"),
        )
    )


@register(
    "tpch_q14_promo_revenue",
    oracle="""
        SELECT CAST(SUM(CASE WHEN p_type = 'ECONOMY'
                        THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
                             * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                        ELSE 0 END) AS BIGINT) AS promo_e4,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
                   AS total_e4
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promo revenue share: month-filtered lineitem joins the part
    dimension (planner-broadcast at test scale), conditional vs total
    revenue in one pass —
    zero shuffles beyond the final 1-row agg exchange."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    rev = ep * (F.lit(100) - dc)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0).cast("long"))
            ).alias("promo_e4"),
            F.sum(rev).alias("total_e4"),
        )
    )


@register(
    "tpch_q6_revenue_forecast",
    oracle="""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT)
                   AS revenue_e4,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    tags=("tpch", "agg"),
)
def tpch_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 revenue forecast: pure scan-side aggregation — every predicate
    pushes into the parquet scan (date range prunes row groups via
    min/max stats) and the single global agg needs one 1-row exchange."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    ep, dc = _cents("l_extendedprice"), _cents("l_discount")
    return li.agg(
        F.sum(ep * dc).alias("revenue_e4"),
        F.count(F.lit(1)).alias("n_lines"),
    )

"""TPC-H completion — the remaining 11 classic query shapes (Q2, Q8,
Q9, Q11, Q12, Q15, Q16, Q17, Q19, Q20, Q21), closing out all 22 with
`operators/tpch.py` (Q1/3/5/6/10/14) and `operators/tpch_ext.py`
(Q4/13/18/22).

The driver schema has no partsupp table, no ship modes and no
commit/receipt dates, so each query keeps its SHAPE — the join topology
and subquery pattern that makes it a distinct optimizer test — with
documented substitutions:

  * partsupp offers       -> lineitem rows as (part, supplier, price) offers
  * ps_supplycost         -> p_retailprice as the unit-cost proxy (Q9)
  * ps_availqty half-sum  -> supplier's shipped-qty share per part (Q20)
  * l_shipmode            -> l_linestatus as the 2-value carrier axis (Q12)
  * commit<receipt lag    -> shipdate > orderdate + 60 days (Q12, Q21 flag)
  * s_comment complaints  -> s_acctbal < 0 as the excluded-supplier set (Q16)

Registered after every driver-capped family (registry._QUERY_MODULES):
verified by the identical local DuckDB-parity gate
(tests/test_oracle_parity.py) and — because every oracle here is ANSI —
also executed verbatim by Spark's own SQL parser
(tests/test_sql_surface.py::test_tpch_oracle_sql_runs_on_spark).

Money discipline matches operators/tpch.py: cent-valued columns become
exact ROUND(x*100) int64 once, arithmetic stays integer to the end, and
any final ratio divides two exact integers in fp64 so both engines agree
bit-for-bit. LIMIT queries always order with a unique tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.caching import pin
from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("long")


def _volume_e4():
    """Exact revenue*1e4: ep_cents * (100 - disc_cents)."""
    return _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))


_VOLUME_E4_SQL = (
    "CAST(ROUND(l_extendedprice*100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount*100) AS BIGINT))"
)


# tpch_q2_min_cost_supplier and tpch_q21_waiting_suppliers moved to
# operators/tpch_hot.py (r18 rotation split: the two r17-restructured
# queries sit in the driver cap without spending nine slots on this
# module's untouched tail) — same pattern as the events_quant split.


@register(
    "tpch_q8_market_share",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_e4
                             ELSE 0 END) AS BIGINT) AS nation_volume_e4,
               CAST(SUM(volume_e4) AS BIGINT) AS total_volume_e4,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_e4
                             ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume_e4) AS DOUBLE) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   n2.n_name AS supp_nation,
                   {_VOLUME_E4_SQL} AS volume_e4
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON n1.n_nationkey = c_nationkey
            JOIN region ON r_regionkey = n1.n_regionkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation n2 ON n2.n_nationkey = s_nationkey
            WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        ) all_nations
        GROUP BY o_year
    """,
    tags=("tpch", "join", "headline"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: conditional-fraction-of-total over a
    7-way join, the widest join tree in the suite.

    Plan: the filtered part scan (~1/6 of parts) prunes lineitem FIRST —
    the selective dimension drives the tree. Only the constant-size
    frames (both nation roles, region) carry explicit broadcast hints;
    part / supplier / customer / orders are data-proportional and left
    to the size-based planner — broadcast at test scale, shuffle at
    100 TB. The share
    divides two exact integer sums in fp64, bit-identical across
    engines."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_suppkey", _volume_e4().alias("volume_e4")
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_regionkey")
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation")
    )
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume_e4")).otherwise(0)
    )
    total_vol = F.sum("volume_e4")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("nk1"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("nk2"))
        .groupBy("o_year")
        .agg(
            nation_vol.alias("nation_volume_e4"),
            total_vol.alias("total_volume_e4"),
            (nation_vol.cast("double") / total_vol.cast("double")).alias("mkt_share"),
        )
    )


@register(
    "tpch_q9_product_profit",
    oracle=f"""
        SELECT nation, o_year, CAST(SUM(amount_e4) AS BIGINT) AS profit_e4
        FROM (
            SELECT n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   {_VOLUME_E4_SQL}
                     - CAST(ROUND(p_retailprice*100) AS BIGINT)
                       * CAST(l_quantity AS BIGINT) * 100 AS amount_e4
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN orders ON o_orderkey = l_orderkey
            WHERE p_name LIKE '%red%'
        ) profit
        GROUP BY nation, o_year
    """,
    tags=("tpch", "join", "headline"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit: revenue minus cost over a LIKE-filtered
    part family, grouped by supplier nation x order year. ps_supplycost
    doesn't exist here, so unit cost is p_retailprice (broadcast with the
    part row — no extra join).

    Plan: the LIKE filter prunes part before the join; nation carries the
    only explicit broadcast hint (constant-size) — part and supplier are
    data-proportional, planner-chosen; lineitem x orders is the one
    big shuffle join; profit
    stays exact integer e4 (cents x cents-scale) until the final sum."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        "l_orderkey",
        _volume_e4().alias("volume_e4"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", _cents("p_retailprice").alias("retail_cents"))
    )
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "amount_e4",
            F.col("volume_e4") - F.col("retail_cents") * F.col("qty") * F.lit(100),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount_e4").alias("profit_e4"))
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
        WITH vals AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))
                        AS BIGINT) AS value_cents
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            WHERE n_name = 'NATION_1'
            GROUP BY l_partkey
        )
        SELECT l_partkey, value_cents
        FROM vals
        WHERE CAST(value_cents AS DOUBLE) >
              (SELECT CAST(SUM(value_cents) AS DOUBLE) * 0.001 FROM vals)
    """,
    tags=("tpch", "subquery"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock: per-key value vs a scalar fraction-of-total
    subquery (partsupp value becomes shipped lineitem value for one
    nation's suppliers).

    Plan: the nation's supplier keys semi-join into the lineitem scan
    (planner-broadcast at test scale — the frame is data-proportional,
    so no forced hint); ONE shuffle builds the per-part sums; the total is a
    one-row aggregate of that same frame cross-joined by broadcast —
    lazy, no driver collect. The per-part frame is pin()ned: exchange
    reuse does NOT fire here (the threshold branch's canonicalized plan
    differs by an inferred isnotnull join-key filter — verified r5), so
    without the persist the lineitem scan+agg would run twice.
    tests/test_plans.py asserts the single-scan property."""
    natsupp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    vals = pin(
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", _cents("l_extendedprice").alias("ep_cents"))
        .join(natsupp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum("ep_cents").alias("value_cents"))
    )
    threshold = vals.agg(
        (F.sum("value_cents").cast("double") * F.lit(0.001)).alias("thr")
    )
    return (
        vals.join(F.broadcast(threshold))
        .filter(F.col("value_cents").cast("double") > F.col("thr"))
        .select("l_partkey", "value_cents")
    )


@register(
    "tpch_q12_late_lines_priority",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
          AND year(l_shipdate) = 1997
        GROUP BY l_linestatus
    """,
    tags=("tpch", "join"),
)
def tpch_q12_late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping priority split: conditional counts over a join with a
    CROSS-TABLE date predicate (no commit/receipt dates, so "late" is
    shipped >60 days after ordering; l_linestatus stands in for the
    two-valued shipmode axis).

    Plan: the year filter is spelled as a shipdate RANGE so it pushes to
    the parquet scan as min/max row-group pruning (a year() call would
    not push); the 60-day lag predicate is a post-join residual (it
    references both sides, so no pushdown is possible — exactly Q12's
    point); one shuffle join on orderkey, one 2-group aggregate."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM({_VOLUME_E4_SQL}) AS BIGINT) AS total_revenue_e4
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue_e4
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue_e4 = (SELECT MAX(total_revenue_e4) FROM revenue)
    """,
    tags=("tpch", "subquery"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: the revenue-view + scalar-MAX-subquery shape
    (every supplier tied at the max is returned — NOT a top-1 window,
    which would drop ties differently).

    Plan: one shuffle for the quarter's per-supplier revenue; the MAX is
    a one-row aggregate of the same frame, broadcast back lazily;
    supplier names broadcast. The revenue frame is pin()ned: exchange
    reuse does NOT fire here (the two branches canonicalize differently
    — an inferred isnotnull join-key filter on one side; verified r5),
    so without the persist the lineitem scan+agg would run twice.
    tests/test_plans.py asserts the single-scan property."""
    rev = pin(
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_volume_e4()).alias("total_revenue_e4"))
    )
    best = rev.agg(F.max("total_revenue_e4").alias("best_rev"))
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(best))
        .filter(F.col("total_revenue_e4") == F.col("best_rev"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_e4")
    )


@register(
    "tpch_q16_supplier_cnt_by_part",
    oracle="""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "join"),
)
def tpch_q16_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier counts per part class: COUNT(DISTINCT) under a
    NOT-IN exclusion (complaint suppliers become negative-balance ones).

    Plan: the three part predicates prune the part side before the join;
    the NOT IN is a LEFT ANTI join on a filtered supplier set
    (s_suppkey is non-null, so anti-join and NOT IN agree) — both sides
    data-proportional, so the broadcast choice is the planner's; the distinct count is Spark's two-phase
    partial-distinct aggregate — one shuffle on the group keys."""
    part = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (~F.col("p_type").like("PROMO%"))
            & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_qty_revenue",
    oracle="""
        SELECT CAST(CAST(SUM(ep_cents) AS DOUBLE) / 7.0 AS DOUBLE)
                   AS avg_yearly_cents
        FROM (
            SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS ep_cents,
                   l_quantity, l_partkey
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#1'
        ) brand_lines
        JOIN (
            SELECT l_partkey AS ap,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)
                       AS avg_qty
            FROM lineitem GROUP BY l_partkey
        ) per_part ON l_partkey = ap
        WHERE l_quantity < 0.2 * avg_qty
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: the correlated per-part AVG
    subquery — each line compares against ITS part's average quantity.

    Plan: the brand's partkeys semi-prune the per-part average aggregate
    BEFORE it computes (the oracle averages every part; restricting to
    the joined parts is value-identical and skips >95% of the agg
    work); the brand lines and the averages then meet on partkey. All
    frames here are data-proportional, so broadcasts are planner-chosen
    (taken at test scale). The average divides exact integer sum/count in fp64."""
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem")
    brand_lines = li.select(
        "l_partkey", "l_quantity", _cents("l_extendedprice").alias("ep_cents")
    ).join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    per_part = (
        li.select("l_partkey", F.col("l_quantity").cast("long").alias("qty"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("ap"))
        .agg((F.sum("qty").cast("double") / F.count(F.lit(1))).alias("avg_qty"))
    )
    return (
        brand_lines.join(per_part, F.col("l_partkey") == F.col("ap"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum("ep_cents").cast("double") / F.lit(7.0)).alias("avg_yearly_cents")
        )
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
        SELECT CAST(SUM({_VOLUME_E4_SQL}) AS BIGINT) AS revenue_e4
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "join"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue under a 3-arm disjunction mixing part
    attributes with lineitem attributes (the shipmode/container arms are
    dropped with the missing columns; the brand x size x quantity
    cross-side OR is the shape).

    Plan: Catalyst derives the common prefix (brand IN 3 values,
    size <= 15) and pushes it into the broadcast part side, so the
    broadcast table carries ~3 brands' rows; the residual OR evaluates
    post-join inside codegen. Single broadcast join, single scalar agg —
    no shuffle at all until the final one-row reduce."""
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _volume_e4().alias("volume_e4")
    )
    qty = F.col("l_quantity")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & qty.between(qlo, qhi)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm("Brand#1", 5, 1, 11) | arm("Brand#2", 10, 10, 20) | arm("Brand#3", 15, 20, 30))
        .agg(F.sum("volume_e4").alias("revenue_e4"))
    )


@register(
    "tpch_q20_excess_share_suppliers",
    oracle="""
        WITH shipped AS (
            SELECT l_partkey, l_suppkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_partkey, l_suppkey
        ), part_total AS (
            SELECT l_partkey AS tp, CAST(SUM(supp_qty) AS BIGINT) AS total_qty
            FROM shipped GROUP BY l_partkey
        )
        SELECT DISTINCT s_suppkey, s_name
        FROM shipped
        JOIN part_total ON l_partkey = tp
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE p_name LIKE 'small%'
          AND n_name = 'NATION_2'
          AND CAST(supp_qty AS DOUBLE) > 0.3 * CAST(total_qty AS DOUBLE)
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion: suppliers holding an outsized share
    of a part family's volume (availqty > half-year-demand becomes
    supplier's shipped share > 30% of the part's 1996 total — the same
    nested correlated-aggregate chain ending in a DISTINCT supplier
    list).

    Plan: one shuffle on (partkey, suppkey) builds supplier shares; the
    per-part totals REUSE that aggregate (second agg is a rollup of the
    first, map-side combinable); the name-filtered part semi-join and the
    single nation's supplier join are planner-broadcast at test scale
    (data-proportional, no forced hints); DISTINCT collapses multi-part
    qualifiers."""
    shipped = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("supp_qty"))
    )
    part_total = shipped.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.sum("supp_qty").alias("total_qty")
    )
    part = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        shipped.join(part_total, F.col("l_partkey") == F.col("tp"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .filter(
            F.col("supp_qty").cast("double") > F.lit(0.3) * F.col("total_qty").cast("double")
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )

"""Cohort lifetime-value matrix (round 9) — the classic retention-
revenue view: customers grouped by FIRST-ORDER month (the cohort), each
cohort's revenue tracked by integer months-since-first-order.  The
table behind "how much does a January-acquired customer spend in month
3" — together with evt_retention (activity retention) this completes
the cohort-analysis pair (activity + monetary).

No analog in the reference (SURVEY §2.1); relational/analytics
extension surface over the TPC-H-ish orders table.

Scale posture: ONE orders scan — the per-customer first-order month is
a MIN window over the o_custkey partition (the bucketed-layout key),
not a self-join, so the whole plan is scan -> one user-keyed shuffle
-> one (cohort, offset) aggregate on a months²-bounded key space;
cohort/offset arithmetic is pure integer month math (year*12+month —
no fp, no interval semantics to disagree on).  Revenue is exact cents
(CENTS-style ROUND) so the hash compare is fp-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

_MIDX = "(EXTRACT(YEAR FROM {c}) * 12 + EXTRACT(MONTH FROM {c}) - 1)"


@register(
    "orders_cohort_ltv",
    oracle=f"""
        WITH firsts AS (
            SELECT o_custkey,
                   CAST(MIN({_MIDX.format(c='o_orderdate')}) AS BIGINT)
                       AS cohort_idx
            FROM orders GROUP BY o_custkey
        ),
        tagged AS (
            SELECT f.cohort_idx,
                   CAST({_MIDX.format(c='o.o_orderdate')} AS BIGINT)
                       - f.cohort_idx AS month_offset,
                   o.o_custkey,
                   CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
            FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
        )
        SELECT lpad(CAST(cohort_idx // 12 AS VARCHAR), 4, '0') || '-' ||
                   lpad(CAST(cohort_idx % 12 + 1 AS VARCHAR), 2, '0')
                   AS cohort_month,
               month_offset,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM tagged GROUP BY cohort_idx, month_offset
    """,
    tags=("tpch", "agg", "join"),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (cohort_month, month_offset): distinct active customers,
    order count, and exact revenue cents.  month_offset 0 is the
    acquisition month by construction (every customer's first order
    lands there), which the unit test pins along with column-sum
    conservation against the raw table."""
    from pyspark.sql import Window

    midx = (
        F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    ).cast("long")
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        midx.alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # first-order month as a window over the customer partition — one
    # scan, one user-keyed shuffle, no self-join
    tagged = orders.withColumn(
        "cohort_idx", F.min("m").over(Window.partitionBy("o_custkey"))
    )
    cohort_month = F.concat(
        F.lpad((F.col("cohort_idx") / 12).cast("long").cast("string"), 4, "0"),
        F.lit("-"),
        F.lpad((F.col("cohort_idx") % 12 + 1).cast("string"), 2, "0"),
    )
    return (
        tagged.groupBy(
            "cohort_idx",
            (F.col("m") - F.col("cohort_idx")).alias("month_offset"),
        )
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
        )
        .select(
            cohort_month.alias("cohort_month"),
            "month_offset",
            "n_customers",
            "n_orders",
            "revenue_cents",
        )
    )

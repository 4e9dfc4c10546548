"""Revenue concentration (round 9) — the Pareto question every
dataset/revenue review asks: how much of total revenue do the top
TOP_CUSTOMERS customers carry?  A single-row card with exact cents and
an integer-permille share — the concentration metric that decides
whether a corpus (or a business) is dominated by a few heavy sources,
the relational sibling of dedup_source_dup_rate's governance view.

No analog in the reference (SURVEY §2.1); relational/analytics
extension surface.

Scale posture: one orders scan -> per-customer cents aggregate (one
custkey-keyed shuffle, map-side combinable) -> top-k via
orderBy+limit (TakeOrderedAndProject: per-partition heads, driver
merges k*p rows — never a global sort, the r8 verdict's scale-killer
class) -> two single-row aggregates.  Ties at the cut rank break by
customer id, so the selected set (and therefore the hash) is
deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

TOP_CUSTOMERS = 100


@register(
    "orders_revenue_concentration",
    oracle=f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY o_custkey
        ),
        top AS (
            SELECT cents FROM per_cust
            ORDER BY cents DESC, o_custkey LIMIT {TOP_CUSTOMERS}
        )
        SELECT CAST((SELECT COUNT(*) FROM per_cust) AS BIGINT)
                   AS n_customers,
               CAST((SELECT SUM(cents) FROM per_cust) AS BIGINT)
                   AS total_cents,
               CAST((SELECT SUM(cents) FROM top) AS BIGINT) AS top_cents,
               CAST(CAST((SELECT SUM(cents) FROM top) * 1000 AS BIGINT)
                   // (SELECT SUM(cents) FROM per_cust) AS BIGINT) AS share_pm
    """,
    tags=("tpch", "agg", "topk"),
)
def orders_revenue_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One row: customer count, total revenue cents, the top
    TOP_CUSTOMERS customers' revenue cents, and their integer-permille
    share."""
    per_cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
    )
    totals = per_cust.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"),
    )
    top = (
        per_cust.orderBy(F.desc("cents"), F.asc("o_custkey"))
        .limit(TOP_CUSTOMERS)
        .agg(F.sum("cents").alias("top_cents"))
    )
    return totals.crossJoin(top).select(
        "n_customers",
        "total_cents",
        "top_cents",
        F.expr("top_cents * 1000 div total_cents").alias("share_pm"),
    )

"""RFM customer segmentation (round 8) — the classic warehouse
marketing cube over the orders fact: every customer banded by Recency
(days since last order), Frequency (order count) and Monetary (exact
lifetime cents), rolled up to segment cells. The "who are my dormant
big spenders" table.

No analog in the reference (SURVEY §2.1); relational-analytics
extension surface alongside the TPC-H set (q13's distribution and
q22's idle-customer anti-join are the nearest relatives — this adds
the banded-cube view both stop short of).

Band edges are FIXED constants, not quantiles — deliberately: fixed
bands are what production RFM dashboards pin (comparable across runs),
and they keep the operator scale-clean — every band assignment is a
per-row comparison, so the whole query is one orders aggregate on
o_custkey, one broadcast-dimension left join (customers with no orders
land in the 'never' cell, the q22 population), and a map-side-
combinable roll-up onto a <= 4x4x4-cell key space. A quantile-banded
variant would need a global rank over the customer grain — the one
unpartitioned-window shape this repo avoids everywhere at scale.

Determinism discipline: monetary is the exact-cents BIGINT (the repo's
standard ROUND(x*100) contract); recency is an integer day diff
against a fixed anchor; all cells are exact counts/sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

RFM_ANCHOR = "2001-09-01"  # fixed analysis date (just past the data's max)
R_ACTIVE_D, R_COOLING_D = 365, 1095  # <=1y active, <=3y cooling, else dormant
F_HIGH, F_MID = 13, 8  # order-count band edges
M_LARGE_C, M_MID_C = 300_000_000, 150_000_000  # lifetime-cents band edges


@register(
    "orders_rfm_segments",
    oracle=f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents,
                   date_diff('day', MAX(o_orderdate),
                             TIMESTAMP '{RFM_ANCHOR} 00:00:00') AS rec_days
            FROM orders GROUP BY o_custkey
        ),
        banded AS (
            SELECT c.c_custkey,
                   CASE WHEN p.o_custkey IS NULL THEN 'never'
                        WHEN rec_days <= {R_ACTIVE_D} THEN 'active'
                        WHEN rec_days <= {R_COOLING_D} THEN 'cooling'
                        ELSE 'dormant' END AS r_band,
                   CASE WHEN p.o_custkey IS NULL THEN 'none'
                        WHEN n_orders >= {F_HIGH} THEN 'high'
                        WHEN n_orders >= {F_MID} THEN 'mid'
                        ELSE 'low' END AS f_band,
                   CASE WHEN p.o_custkey IS NULL THEN 'none'
                        WHEN cents >= {M_LARGE_C} THEN 'large'
                        WHEN cents >= {M_MID_C} THEN 'mid'
                        ELSE 'small' END AS m_band,
                   COALESCE(cents, 0) AS cents
            FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
        )
        SELECT r_band, f_band, m_band,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS total_cents
        FROM banded GROUP BY r_band, f_band, m_band
    """,
    tags=("tpch", "join", "agg"),
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-cell roll-up: (r_band, f_band, m_band) -> customer count
    and exact total lifetime cents. Customers without orders form the
    ('never','none','none') cell."""
    return rfm_segments(
        table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    )


def rfm_segments(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """The banding plan over any (orders, customer) pair — split out so
    the fixture-absent 'never' cell is testable on a synthetic input
    (every sf0.01 customer has orders)."""
    anchor = F.lit(f"{RFM_ANCHOR} 00:00:00").cast("timestamp")
    per_cust = (
        orders.groupBy(F.col("o_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
            F.datediff(anchor, F.max("o_orderdate")).alias("rec_days"),
        )
    )
    cust = customer.select("c_custkey")
    no_orders = F.col("o_custkey").isNull()
    banded = cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "left"
    ).select(
        F.when(no_orders, "never")
        .when(F.col("rec_days") <= R_ACTIVE_D, "active")
        .when(F.col("rec_days") <= R_COOLING_D, "cooling")
        .otherwise("dormant")
        .alias("r_band"),
        F.when(no_orders, "none")
        .when(F.col("n_orders") >= F_HIGH, "high")
        .when(F.col("n_orders") >= F_MID, "mid")
        .otherwise("low")
        .alias("f_band"),
        F.when(no_orders, "none")
        .when(F.col("cents") >= M_LARGE_C, "large")
        .when(F.col("cents") >= M_MID_C, "mid")
        .otherwise("small")
        .alias("m_band"),
        F.coalesce(F.col("cents"), F.lit(0)).alias("cents"),
    )
    return banded.groupBy("r_band", "f_band", "m_band").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"),
    )

"""Header/detail monetary reconciliation (round 12) — the bread-and-
butter ETL validation the dq family lacked: does the order header's
total equal the sum of its lines' extended amounts?  Per order status:
how many orders, how many have NO lines at all (orphan headers — the
referential gap dq_ri counts globally, here broken out by status), how
many reconcile to the cent, and the signed/absolute cent-delta
aggregates that size the discrepancy.

Exactness: each LINE's amount is rounded to cents first
(ROUND(ext * (1-disc) * (1+tax) * 100) — one deterministic fp
expression per row, identical trees both engines), then summed as
BIGINT — so the per-order delta is exact integer cents, never an
fp-accumulation artifact.  On this fixture headers and lines are
independently generated, so every joined order mismatches (the
realistic broken-feed picture) and 257 headers are orphans at sf0.01;
the planted-fixture test builds a consistent book to keep the
n_matched branch live.

No analog in the reference (SURVEY §2.1); dq extension surface.

Scale posture: one lineitem scan -> per-order BIGINT sum (map-side
combinable on l_orderkey), one orders scan, one equi-join on the order
key (co-partitioned after the aggregate), |status|-keyed rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

_LINE_CENTS_SQL = (
    "CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)"
    " AS BIGINT)"
)

_RECON_ORACLE_SQL = f"""
    WITH line_sums AS (
        SELECT l_orderkey, SUM({_LINE_CENTS_SQL}) AS line_cents
        FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
        SELECT o.o_orderstatus,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS header_cents,
               ls.line_cents
        FROM orders o LEFT JOIN line_sums ls
          ON o.o_orderkey = ls.l_orderkey
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (line_cents IS NULL) AS BIGINT)
               AS n_orphan_headers,
           CAST(COUNT(*) FILTER (line_cents = header_cents) AS BIGINT)
               AS n_matched,
           CAST(COALESCE(SUM(header_cents - line_cents)
                    FILTER (line_cents IS NOT NULL), 0) AS BIGINT)
               AS sum_delta_cents,
           CAST(COALESCE(MAX(ABS(header_cents - line_cents))
                    FILTER (line_cents IS NOT NULL), 0) AS BIGINT)
               AS max_abs_delta_cents
    FROM joined GROUP BY o_orderstatus
"""


@register(
    "dq_order_reconciliation",
    oracle=_RECON_ORACLE_SQL,
    tags=("dq", "join", "agg"),
)
def dq_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderstatus, n_orders, n_orphan_headers, n_matched,
    sum_delta_cents, max_abs_delta_cents): header-vs-lines monetary
    reconciliation in exact integer cents, orphan headers broken out
    per status."""
    line_cents = F.round(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100
    ).cast("long")
    line_sums = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", line_cents.alias("lc"))
        .groupBy("l_orderkey")
        .agg(F.sum("lc").alias("line_cents"))
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("header_cents"),
    )
    joined = orders.join(
        line_sums, orders.o_orderkey == line_sums.l_orderkey, "left"
    )
    delta = F.col("header_cents") - F.col("line_cents")
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("line_cents").isNull(), 1))
        .cast("long")
        .alias("n_orphan_headers"),
        F.count(F.when(F.col("line_cents") == F.col("header_cents"), 1))
        .cast("long")
        .alias("n_matched"),
        F.coalesce(F.sum(delta), F.lit(0)).cast("long").alias("sum_delta_cents"),
        F.coalesce(F.max(F.abs(delta)), F.lit(0))
        .cast("long")
        .alias("max_abs_delta_cents"),
    )

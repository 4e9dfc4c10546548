"""Equi-width numeric histograms (round 12) — the optimizer-statistics
component the profile family lacked: per numeric column, B fixed-width
buckets over the observed [min, max] with exact integer bounds and
counts — what an ANALYZE TABLE pass persists for selectivity estimation
and what a data-quality dashboard draws.  Covers the two money-bearing
columns (orders.o_totalprice, events.value), both in integer cents.

Exactness: bucket index = LEAST(B-1, (v - lo) * B div (hi - lo + 1)) —
pure BIGINT arithmetic on cent values, so both engines compute the
identical bucket for every row (no fp widths, no round-half cases);
bucket bounds are reported as the same integer formula.

No analog in the reference (SURVEY §2.1); profile extension surface.

Scale posture: two passes per column — a min/max aggregate (map-side
combinable to two scalars) and a bucket groupBy (B keys, map-side
combinable); both one scan each, no shuffle wider than B rows.  The
min/max pass is the same footer-adjacent statistic a real ANALYZE reads
from metadata when available; kept as a scan here so the result is
oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

HIST_BUCKETS = 20

_HIST_ORACLE_SQL = f"""
    WITH src AS (
        SELECT 'orders.o_totalprice' AS col_name,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
        UNION ALL
        SELECT 'events.value' AS col_name,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    bounds AS (
        SELECT col_name, MIN(cents) AS lo, MAX(cents) AS hi
        FROM src GROUP BY col_name
    ),
    bucketed AS (
        SELECT s.col_name,
               LEAST({HIST_BUCKETS - 1},
                     ((s.cents - b.lo) * {HIST_BUCKETS})
                         // (b.hi - b.lo + 1)) AS bucket,
               b.lo, b.hi
        FROM src s JOIN bounds b ON s.col_name = b.col_name
    )
    SELECT col_name,
           CAST(bucket AS BIGINT) AS bucket,
           CAST(lo + bucket * (hi - lo + 1) // {HIST_BUCKETS} AS BIGINT)
               AS bucket_lo_cents,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM bucketed
    GROUP BY col_name, bucket, lo, hi
"""


@register(
    "prof_numeric_histogram",
    oracle=_HIST_ORACLE_SQL,
    tags=("profile", "agg"),
)
def prof_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(col_name, bucket, bucket_lo_cents, n_rows): {HIST_BUCKETS}
    equi-width buckets over integer cents for orders.o_totalprice and
    events.value — empty buckets emit no row (counts conserve to the
    table sizes; unit test)."""
    orders = table(spark, sf_dir, "orders").select(
        F.lit("orders.o_totalprice").alias("col_name"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    events = table(spark, sf_dir, "events").select(
        F.lit("events.value").alias("col_name"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    src = orders.unionByName(events)
    bounds = src.groupBy("col_name").agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    width_num = F.col("hi") - F.col("lo") + F.lit(1)
    bucket = F.least(
        F.lit(HIST_BUCKETS - 1),
        F.expr(f"((cents - lo) * {HIST_BUCKETS}) div (hi - lo + 1)"),
    )
    return (
        src.join(F.broadcast(bounds), "col_name")
        .select(
            "col_name",
            bucket.cast("long").alias("bucket"),
            "lo",
            "hi",
        )
        .groupBy("col_name", "bucket", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "col_name",
            "bucket",
            (
                F.col("lo")
                + F.expr(f"bucket * (hi - lo + 1) div {HIST_BUCKETS}")
            )
            .cast("long")
            .alias("bucket_lo_cents"),
            F.col("n_rows").cast("long"),
        )
    )

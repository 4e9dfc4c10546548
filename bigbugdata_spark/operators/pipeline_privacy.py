"""Privacy-gated release (round 10) — dq_k_anonymity composed into the
action it exists for, the pipe_semantic_guard treatment: SUPPRESS every
row sitting in a quasi-identifier cell below K_ANON, release the rest,
and account for the cut — per event_type the released/suppressed row
split, the released cell count, and the released table's worst cell
size, which by construction is >= K_ANON (the k-anonymity guarantee the
release ships with; NULL when a type releases nothing).

No analog in the reference (SURVEY §2.1); dq/governance extension
surface composing dq_anon's cell frame.

Determinism: exact integer counts; the suppression predicate compares
integer cell sizes.

Scale posture: the QI cell frame (one map-side groupBy) joins back to
itself only logically — the released accounting aggregates the CELL
frame, never re-touching raw rows: suppression counts are sums of cell
sizes on either side of the predicate, so the whole query is one
groupBy over events + two cells-sized rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL
from bigbugdata_spark.operators.dq_anon import BAND_CENTS, K_ANON
from bigbugdata_spark.registry import register

_RELEASE_SQL = f"""
    WITH cells AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               {CENTS_SQL} // {BAND_CENTS} AS band,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type, day, band
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN n >= {K_ANON} THEN n ELSE 0 END) AS BIGINT)
               AS n_released,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT)
               AS n_suppressed,
           CAST(SUM(CASE WHEN n >= {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_released_cells,
           CAST(MIN(CASE WHEN n >= {K_ANON} THEN n END) AS BIGINT)
               AS min_released_cell
    FROM cells GROUP BY event_type
"""


@register(
    "pipe_privacy_release",
    oracle=_RELEASE_SQL,
    tags=("dq", "pipeline", "agg"),
)
def pipe_privacy_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_released, n_suppressed, n_released_cells,
    min_released_cell): the k-anonymous release accounting — every
    below-k QI cell's rows suppressed, and the released side's minimum
    cell size carries the shipped guarantee (>= K_ANON wherever
    anything releases)."""
    cells = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.expr(
                f"CAST(ROUND(value * 100) AS BIGINT) div {BAND_CENTS}"
            ).alias("band"),
        )
        .groupBy("event_type", "day", "band")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    keep = F.col("n") >= K_ANON
    return cells.groupBy("event_type").agg(
        F.sum(F.when(keep, F.col("n")).otherwise(0)).alias("n_released"),
        F.sum(F.when(~keep, F.col("n")).otherwise(0)).alias("n_suppressed"),
        F.sum(keep.cast("long")).alias("n_released_cells"),
        F.min(F.when(keep, F.col("n"))).alias("min_released_cell"),
    )

"""Activity seasonality profile (round 9) — the hour-of-day x
day-of-week heatmap every event monitor publishes, with an exact
integer hot-cell flag: cells whose traffic exceeds 1.5x the uniform
expectation.  Feeds capacity planning and doubles as the baseline
shape drift monitors compare against (dq_distribution_drift watches
category mix; this watches TIME mix).

No analog in the reference (SURVEY §2.1); events extension surface.

Determinism: the day-of-week convention is pinned to ISO (Mon=1..7) on
both engines — Spark's `weekday()+1` == DuckDB's `isodow()` — because
default dayofweek() conventions differ across engines; counts are
exact, the hot flag is an integer cross-multiply (2*168*n_cell >
3*total, i.e. cell > 1.5x uniform), no division anywhere except one
final fp64 share column derived from exact integers.

Scale posture: one events scan, one map-side-combinable aggregate on a
key space bounded by 168 cells — the cheapest possible monitor shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register


SEASONALITY_ORACLE_SQL = """
        WITH cells AS (
            SELECT CAST(isodow(ts) AS BIGINT) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hod,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT cells.*, SUM(n_events) OVER () AS total FROM cells
        )
        SELECT dow, hod, n_events,
               CAST(n_events * 1000 AS DOUBLE) / total AS share_pm,
               CAST(2 * 168 * n_events > 3 * total AS INT) AS is_hot
        FROM tot
"""


def season_cells(ev: DataFrame) -> DataFrame:
    """(dow, hod) -> count — one map-side-combinable aggregate,
    streaming-safe (shared with the live monitor in
    streaming/seasonality.py)."""
    return ev.groupBy(
        (F.weekday("ts") + 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n_events"))


def finish_seasonality(cells: DataFrame) -> DataFrame:
    """Shares + hot flags over the 168-cell frame (batch tail of both
    the batch and streaming seasonality queries)."""
    from pyspark.sql import Window

    # 168-row frame: totals roll up in place (bounded, like dq_drift)
    total = F.sum("n_events").over(Window.partitionBy())
    return cells.select(
        "dow",
        "hod",
        "n_events",
        total.alias("_t"),
    ).select(
        "dow",
        "hod",
        "n_events",
        ((F.col("n_events") * 1000).cast("double") / F.col("_t")).alias(
            "share_pm"
        ),
        (
            F.lit(2) * 168 * F.col("n_events") > F.lit(3) * F.col("_t")
        )
        .cast("int")
        .alias("is_hot"),
    )


@register(
    "evt_seasonality_profile",
    oracle=SEASONALITY_ORACLE_SQL,
    tags=("events", "agg"),
)
def evt_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (ISO day-of-week, hour-of-day): event count, permille share,
    and the exact-integer hot flag (cell > 1.5x the uniform 1/168
    expectation)."""
    return finish_seasonality(season_cells(table(spark, sf_dir, "events")))

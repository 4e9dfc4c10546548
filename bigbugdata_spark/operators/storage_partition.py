"""Partition-granularity advisor (round 12) — the lake-DESIGN
component next to the lake-MAINTENANCE ones (compaction plan, encoding
advisor, GC plan): given the events table's time distribution, evaluate
day / week / month partitioning and recommend the FINEST granularity
whose smallest partition still clears a minimum-rows floor — the
standard small-files guard (a partition below the floor produces files
under the efficient scan size no matter how well the writer packs).

Output is one row per granularity with the stats a reviewer needs
(partition count, min/max/total rows, rows-per-partition floor check)
plus the chosen flag, so the recommendation is auditable, not oracular.

Exactness: pure counts over date_trunc buckets; the chosen flag is
integer comparisons only.  Week truncation differs between engines
(Spark date_trunc('week') is Monday-anchored, DuckDB's likewise), so
both sides use their native date_trunc — pinned equal by the hash
compare itself.

No analog in the reference (SURVEY §2.1); storage extension surface.

Scale posture: three aggregates over one events scan (union of three
date_trunc projections — Catalyst reuses the scan), each map-side
combinable to |partitions| rows; the advisor's decision join is over
three rows.  At 100 TB this runs off partition-level row counts from
the metastore instead of a scan; the scan form keeps it
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

#: a partition below this many rows flags the granularity as too fine
#: (would produce sub-efficient files); sized for the test fixture the
#: same way GRAPH_CELL_ROWS is — production overrides per target file
#: size / row width
MIN_PART_ROWS = 2_000

_PART_ORACLE_SQL = f"""
    WITH per_gran AS (
        SELECT gran, bucket, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM (
            SELECT 'day' AS gran, date_trunc('day', ts) AS bucket FROM events
            UNION ALL
            SELECT 'week', date_trunc('week', ts) FROM events
            UNION ALL
            SELECT 'month', date_trunc('month', ts) FROM events
        )
        GROUP BY gran, bucket
    ),
    stats AS (
        SELECT gran,
               CAST(COUNT(*) AS BIGINT) AS n_partitions,
               CAST(MIN(n_rows) AS BIGINT) AS min_rows,
               CAST(MAX(n_rows) AS BIGINT) AS max_rows,
               CAST(SUM(n_rows) AS BIGINT) AS total_rows,
               CASE WHEN MIN(n_rows) >= {MIN_PART_ROWS} THEN 1 ELSE 0 END
                   AS meets_floor
        FROM per_gran GROUP BY gran
    ),
    ranked AS (
        SELECT *,
               CASE gran WHEN 'day' THEN 1 WHEN 'week' THEN 2 ELSE 3 END
                   AS coarseness
        FROM stats
    )
    SELECT gran,
           n_partitions, min_rows, max_rows, total_rows,
           CAST(meets_floor AS BIGINT) AS meets_floor,
           CAST(CASE WHEN meets_floor = 1 AND coarseness = (
                    SELECT MIN(coarseness) FROM ranked WHERE meets_floor = 1
                ) THEN 1 ELSE 0 END AS BIGINT) AS chosen
    FROM ranked
"""


@register(
    "store_partition_advisor",
    oracle=_PART_ORACLE_SQL,
    tags=("storage", "agg"),
    side_effects=False,  # pure analysis — no lake lifecycle runs here
)
def store_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(gran, n_partitions, min_rows, max_rows, total_rows, meets_floor,
    chosen): day/week/month partition stats for events with the finest
    floor-clearing granularity flagged chosen (exactly one row chosen
    whenever any granularity clears the floor; unit test)."""
    ev = table(spark, sf_dir, "events")
    # one scan, not a 3-way self-union: each row explodes into its three
    # (gran, bucket) memberships map-side
    grans = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(g).alias("gran"),
                        F.date_trunc(g, "ts").alias("bucket"),
                    )
                    for g in ("day", "week", "month")
                ]
            )
        ).alias("g")
    ).select("g.gran", "g.bucket")
    per_gran = grans.groupBy("gran", "bucket").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    stats = per_gran.groupBy("gran").agg(
        F.count(F.lit(1)).alias("n_partitions"),
        F.min("n_rows").alias("min_rows"),
        F.max("n_rows").alias("max_rows"),
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.when(F.min("n_rows") >= MIN_PART_ROWS, F.lit(1))
        .otherwise(F.lit(0))
        .alias("meets_floor"),
    )
    coarseness = (
        F.when(F.col("gran") == "day", 1)
        .when(F.col("gran") == "week", 2)
        .otherwise(3)
    )
    ranked = stats.withColumn("coarseness", coarseness)
    best = (
        ranked.filter(F.col("meets_floor") == 1)
        .agg(F.min("coarseness").alias("best_coarseness"))
    )
    return (
        ranked.join(F.broadcast(best), F.lit(True))
        .select(
            "gran",
            "n_partitions",
            "min_rows",
            "max_rows",
            "total_rows",
            F.col("meets_floor").cast("long").alias("meets_floor"),
            F.when(
                (F.col("meets_floor") == 1)
                & (F.col("coarseness") == F.col("best_coarseness")),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("chosen"),
        )
    )

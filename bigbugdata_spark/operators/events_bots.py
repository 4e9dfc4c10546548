"""Automation (bot) detection via inter-event REGULARITY (round 12) —
the timing-side complement to evt_user_burst's rate anomaly: scripted
actors fire on near-constant intervals, so the robust dispersion of a
user's inter-event gaps collapses relative to its median.  Per user
with at least MIN_EVENTS events: exact rank-selected median gap, MAD
of gaps, and the regular flag MAD * 1000 <= median * REG_PM (MAD
within REG_PM permille of the median) — the events_mad estimator
applied to per-user gap series.

Exactness: gaps are integer microseconds; both medians are
rank-selected (value at row ceil(m/2) of the value-sorted list — the
evt_value_quantiles discrete convention; the selected VALUE is
tie-break-independent, determined by the gap multiset); the flag is an
integer cross-multiplication.  Zero fp anywhere.

No analog in the reference (SURVEY §2.1); events/dq extension surface.

Scale posture: one hash shuffle on user_id feeds the lag window and
both rank selections (same partitioning — exchange reuse); per-user
frames are user-history-sized, exactly the attribution family's
contract (no global sort, no single-task type group).  Unlike
events_mad's value-domain histogram trick, gaps are per-USER series —
the user key IS the spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

MIN_EVENTS = 6  # >= 5 gaps, enough for a meaningful median/MAD
REG_PM = 100  # regular if MAD <= 10% of the median gap

_BOTS_ORACLE_SQL = f"""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS gap_us
        FROM events
    ),
    g AS (
        SELECT user_id, gap_us,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY gap_us)
                   AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS m
        FROM gaps WHERE gap_us IS NOT NULL
    ),
    med AS (
        SELECT user_id, MAX(m) AS m,
               CAST(MAX(CASE WHEN rn = CAST(CEIL(m / 2.0) AS BIGINT)
                        THEN gap_us END) AS BIGINT) AS median_gap_us
        FROM g GROUP BY user_id
        HAVING MAX(m) >= {MIN_EVENTS - 1}
    ),
    adev AS (
        SELECT g.user_id, abs(g.gap_us - med.median_gap_us) AS d,
               ROW_NUMBER() OVER (
                   PARTITION BY g.user_id
                   ORDER BY abs(g.gap_us - med.median_gap_us)) AS rn,
               COUNT(*) OVER (PARTITION BY g.user_id) AS m
        FROM g JOIN med ON g.user_id = med.user_id
    ),
    mad AS (
        SELECT user_id,
               CAST(MAX(CASE WHEN rn = CAST(CEIL(m / 2.0) AS BIGINT)
                        THEN d END) AS BIGINT) AS mad_gap_us
        FROM adev GROUP BY user_id
    )
    SELECT med.user_id,
           CAST(med.m + 1 AS BIGINT) AS n_events,
           med.median_gap_us,
           mad.mad_gap_us,
           CAST(CASE WHEN mad.mad_gap_us * 1000
                          <= med.median_gap_us * {REG_PM}
                THEN 1 ELSE 0 END AS BIGINT) AS regular_flag
    FROM med JOIN mad ON med.user_id = mad.user_id
"""


@register(
    "evt_bot_regularity",
    oracle=_BOTS_ORACLE_SQL,
    tags=("events", "window", "agg"),
)
def evt_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, n_events, median_gap_us, mad_gap_us, regular_flag) for
    users with >= MIN_EVENTS events: rank-exact median/MAD of the
    user's inter-event gaps and the integer cross-multiplied
    regularity flag."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    w_seq = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = (
        ev.withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w_seq))
        .filter(F.col("gap_us").isNotNull())
        .select("user_id", "gap_us")
    )
    w_rank = Window.partitionBy("user_id").orderBy("gap_us")
    w_all = Window.partitionBy("user_id")
    g = gaps.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "m", F.count(F.lit(1)).over(w_all)
    )
    med = (
        g.groupBy("user_id")
        .agg(
            F.max("m").alias("m"),
            F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(F.col("m") / F.lit(2.0)).cast("long"),
                    F.col("gap_us"),
                )
            )
            .cast("long")
            .alias("median_gap_us"),
        )
        .filter(F.col("m") >= MIN_EVENTS - 1)
    )
    adev = (
        g.join(med.select("user_id", "median_gap_us"), "user_id")
        .select(
            "user_id",
            F.abs(F.col("gap_us") - F.col("median_gap_us")).alias("d"),
        )
    )
    w_rank2 = Window.partitionBy("user_id").orderBy("d")
    mad = (
        adev.withColumn("rn", F.row_number().over(w_rank2))
        .withColumn("m", F.count(F.lit(1)).over(w_all))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    F.col("rn")
                    == F.ceil(F.col("m") / F.lit(2.0)).cast("long"),
                    F.col("d"),
                )
            )
            .cast("long")
            .alias("mad_gap_us")
        )
    )
    return med.join(mad, "user_id").select(
        "user_id",
        (F.col("m") + 1).cast("long").alias("n_events"),
        "median_gap_us",
        "mad_gap_us",
        F.when(
            F.col("mad_gap_us") * 1000 <= F.col("median_gap_us") * REG_PM, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("regular_flag"),
    )

"""Daily growth accounting (round 9) — the DAU table every product
and every ingest monitor publishes: per day, event volume, distinct
active users, and the new/returning split (new = first-ever-seen that
day).  Completes the events analytics set next to evt_retention
(cohort survival) and orders_cohort_ltv (monetary cohorts) with the
day-grain acquisition view.

No analog in the reference (SURVEY §2.1); events extension surface.

Scale posture: ONE events scan — the per-user first day is a MIN
window over the user_id partition (the bucketed-layout key), not a
self-join (the orders_cohort_ltv shape), so the plan is scan -> one
user-keyed shuffle -> one day aggregate; day keys are date strings
formatted identically in both engines, and counts are exact integers —
no fp anywhere.  Output is days-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register


@register(
    "evt_growth_accounting",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_id,
                   strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day
            FROM events
        ),
        firsts AS (
            SELECT user_id, MIN(day) AS first_day FROM ev GROUP BY user_id
        )
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_active,
               CAST(COUNT(DISTINCT CASE WHEN day = first_day
                                        THEN ev.user_id END) AS BIGINT)
                   AS n_new,
               CAST(COUNT(DISTINCT CASE WHEN day != first_day
                                        THEN ev.user_id END) AS BIGINT)
                   AS n_returning
        FROM ev JOIN firsts ON ev.user_id = firsts.user_id
        GROUP BY day
    """,
    tags=("events", "agg", "join"),
)
def evt_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day: event count, distinct actives, and the new/returning
    user split (new = the user's first-ever active day; a user active
    on their first day counts in n_new only — n_active = n_new +
    n_returning, pinned by test)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
    )
    # r17 restructure (guide §2.4, the op13/op15 pre-keying): the old
    # shape windowed first_day over RAW events (full sort) and then ran
    # three COUNT(DISTINCT ...) per day — an Expand x4 of every event
    # row.  Establishing the user partitioning once lets the
    # (user_id, day) collapse, the first-day window, and the per-day
    # roll-up all run off ONE raw exchange: after the collapse each
    # (user, day) cell is unique, so every distinct count is a plain
    # SUM/COUNT over cells (n_events rides along as the cell count).
    # Measured 0.32-0.39 -> 0.18-0.26 s min over three interleaved
    # trials; symdiff 0, dtypes identical.
    ud = (
        ev.repartition("user_id")
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    j = ud.withColumn(
        "first_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    return j.groupBy("day").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("n_active"),
        F.sum(
            F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
        ).alias("n_new"),
        F.sum(
            F.when(F.col("day") != F.col("first_day"), 1).otherwise(0)
        ).alias("n_returning"),
    )

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
    # first-ever day as a window over the user partition — one scan,
    # one user-keyed shuffle, no self-join
    joined = ev.withColumn(
        "first_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    return joined.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_active"),
        F.countDistinct(
            F.when(F.col("day") == F.col("first_day"), F.col("user_id"))
        ).alias("n_new"),
        F.countDistinct(
            F.when(F.col("day") != F.col("first_day"), F.col("user_id"))
        ).alias("n_returning"),
    )

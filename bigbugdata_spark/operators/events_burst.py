"""User burst-anomaly detection (round 8) — which users' activity
CONCENTRATES instead of spreading: a user whose busiest hour holds
several times their mean hourly rate is a bot, a scraper, a replayed
client, or an abuse session. The per-user counterpart of the feed-
level dq monitors (volume anomaly, mix drift) — those watch the
pipeline, this watches the actors.

No analog in the reference (SURVEY §2.1); events/dq extension surface
next to evt_user_features.

Determinism discipline: hourly bucket counts, totals and active-hour
counts are exact BIGINTs; the burst flag is decided by integer
cross-multiplication (max_hour * n_active_hours * 1000 >
BURST_PM * n_events — busiest hour exceeds BURST_PM permille of the
mean hourly rate) and the
reported burst_factor is a single fp64 division of exact integers.

Scale posture: one events scan -> (user, hour) hash aggregate
(map-side combinable) -> per-user roll-up of the bucket frame. Both
exchanges key on user_id-led keys, so the user-bucketed layout
(sources/bucketed.py) makes the second one local; output is
user-grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

BURST_PM = 2500  # busiest hour > 2.5x mean hourly rate (permille) -> bursty


@register(
    "evt_user_burst",
    oracle=f"""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY user_id, hr
        )
        SELECT user_id,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_active_hours,
               CAST(MAX(n) AS BIGINT) AS max_hour_events,
               CAST(MAX(n) * COUNT(*) AS DOUBLE) / SUM(n) AS burst_factor,
               CAST(MAX(n) * COUNT(*) * 1000 > {BURST_PM} * SUM(n) AS INT)
                   AS is_bursty
        FROM hourly GROUP BY user_id
    """,
    tags=("events", "dq", "agg"),
)
def evt_user_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: total events, active hours, the busiest hour's count,
    the burst factor (busiest hour / mean hourly rate, exact-integer
    numerator and denominator), and the cross-multiplied burst flag."""
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("hr"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return hourly.groupBy("user_id").agg(
        F.sum("n").alias("n_events"),
        F.count(F.lit(1)).alias("n_active_hours"),
        F.max("n").alias("max_hour_events"),
        (
            (F.max("n") * F.count(F.lit(1))).cast("double") / F.sum("n")
        ).alias("burst_factor"),
        (
            F.max("n") * F.count(F.lit(1)) * F.lit(1000)
            > F.lit(BURST_PM) * F.sum("n")
        )
        .cast("int")
        .alias("is_bursty"),
    )

"""User feature-table builder (round 8) — the feature-engineering face
of the events log: one row per user with the lifecycle and activity
features a training pipeline joins onto its examples (recency,
tenure, volume, mix, spend). This is the "feature store
materialization" op: everything downstream (propensity models, churn
labels, the RFM cube's event-side cousin) starts from exactly this
aggregate.

No analog in the reference (SURVEY §2.1); events extension surface.

Determinism discipline: timestamps format through the repo's pinned
TS_FMT; tenure is an exact epoch-microsecond BIGINT; value features
are the exact-cents contract; the two fp columns (events per active
day, purchase share) are single divisions of exact integers.

Scale posture: ONE events scan, one map-side-combinable aggregate on
user_id — output is user-grain (dimension-sized). The conditional
features (per-type counts, purchase cents) fold into the same
aggregate as CASE sums, so adding features never adds scans or
shuffles. At 100 TB this is the canonical "build the user dim from
the fact" job; the user-bucketed layout (sources/bucketed.py) makes
the downstream example join shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import (
    TS_FMT,
    TS_FMT_DUCK,
    CENTS_SQL,
    cents_col,
)
from bigbugdata_spark.registry import register


def lifecycle_agg_cols() -> list:
    """THE lifecycle aggregate expressions (volume, first/last, exact
    tenure, purchase count/cents) — one definition shared by this
    batch feature table and the live streaming subset
    (streaming/features.py), so the overlapping columns cannot drift
    by construction."""
    is_purchase = F.col("event_type") == "purchase"
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), TS_FMT).alias("first_ts"),
        F.date_format(F.max("ts"), TS_FMT).alias("last_ts"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "tenure_us"
        ),
        F.sum(F.when(is_purchase, 1).otherwise(0)).alias("n_purchases"),
        F.sum(F.when(is_purchase, cents_col()).otherwise(0)).alias(
            "purchase_cents"
        ),
    ]


@register(
    "evt_user_features",
    oracle=f"""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                   AS n_active_days,
               strftime(MIN(ts), '{TS_FMT_DUCK}') AS first_ts,
               strftime(MAX(ts), '{TS_FMT_DUCK}') AS last_ts,
               epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS tenure_us,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN {CENTS_SQL} ELSE 0 END) AS BIGINT)
                   AS purchase_cents,
               CAST(SUM(CASE WHEN event_type = 'error'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
               CAST(COUNT(*) AS DOUBLE)
                   / COUNT(DISTINCT CAST(ts AS DATE)) AS events_per_day,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS purchase_share
        FROM events GROUP BY user_id
    """,
    tags=("events", "agg", "features"),
)
def evt_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: event volume, type diversity, active days, first/last
    activity, tenure in exact microseconds, purchase count/cents, error
    count, and two derived rates (events per active day, purchase
    share) — all from one conditional aggregate."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            *lifecycle_agg_cols(),
            F.countDistinct("event_type").alias("n_types"),
            F.countDistinct(F.to_date("ts")).alias("n_active_days"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
                "n_errors"
            ),
        )
        .withColumn(
            "events_per_day",
            F.col("n_events").cast("double") / F.col("n_active_days"),
        )
        .withColumn(
            "purchase_share",
            F.col("n_purchases").cast("double") / F.col("n_events"),
        )
    )

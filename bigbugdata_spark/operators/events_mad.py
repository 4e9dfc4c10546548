"""Robust value-anomaly profile via median/MAD (round 9) — the outlier
monitor that mean/stddev cannot give on heavy-tailed value streams:
per event_type, the exact rank-based median, the median absolute
deviation, and how many events sit beyond K_MAD mads.  Together with
evt_value_quantiles (tail percentiles) and evt_user_burst (actor-side
rates) this completes the value-side dq monitoring set with the
standard robust estimator.

No analog in the reference (SURVEY §2.1); events/dq extension surface.

Determinism: both medians are RANK-SELECTED (value at row ceil(n/2) of
the (value, event_id)-sorted group — evt_value_quantiles' discrete
convention, no interpolation, no sketch), deviations and the outlier
comparison are exact integer cents, so the result is engine-exact with
zero fp anywhere.

Scale posture: two windowed passes partitioned by event_type (the same
per-group-sort contract as evt_value_quantiles — past the point a
single group outgrows a partition, the approximate path is the
sketch-based monitor, deliberately un-oracled); the deviation frame
carries only (event_type, cents, event_id), and the final roll-up is a
|event_type|-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL, cents_col
from bigbugdata_spark.registry import register

K_MAD = 5  # flag events with |cents - median| > K_MAD * mad


@register(
    "evt_anomaly_mad",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type, {CENTS_SQL} AS cents, event_id,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY {CENTS_SQL}, event_id) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM events
        ),
        med AS (
            SELECT event_type,
                   MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                            THEN cents END) AS median_cents
            FROM ranked GROUP BY event_type
        ),
        dev AS (
            SELECT r.event_type, r.cents,
                   ABS(r.cents - m.median_cents) AS adev,
                   ROW_NUMBER() OVER (
                       PARTITION BY r.event_type
                       ORDER BY ABS(r.cents - m.median_cents), r.event_id
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY r.event_type) AS n,
                   m.median_cents
            FROM ranked r JOIN med m ON r.event_type = m.event_type
        ),
        mad AS (
            SELECT event_type,
                   MAX(median_cents) AS median_cents,
                   MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                            THEN adev END) AS mad_cents,
                   CAST(MAX(n) AS BIGINT) AS n_events
            FROM dev GROUP BY event_type
        )
        SELECT d.event_type,
               CAST(MAX(m.median_cents) AS BIGINT) AS median_cents,
               CAST(MAX(m.mad_cents) AS BIGINT) AS mad_cents,
               CAST(MAX(m.n_events) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN d.adev > {K_MAD} * m.mad_cents
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m ON d.event_type = m.event_type
        GROUP BY d.event_type
    """,
    tags=("events", "dq", "window"),
)
def evt_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: rank-based median cents, the median absolute
    deviation, event count, and how many events deviate beyond
    K_MAD * mad (strict >, so a zero-MAD constant stream flags only
    genuinely different values)."""
    ev = table(spark, sf_dir, "events").select(
        "event_type", cents_col().alias("cents"), "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )

    def pick(frame, col):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(0.5) * F.col("n")).cast("long"),
                F.col(col),
            )
        )

    med = ranked.groupBy("event_type").agg(pick(ranked, "cents").alias("median_cents"))
    dev = (
        ev.join(med, "event_type")
        .withColumn("adev", F.abs(F.col("cents") - F.col("median_cents")))
    )
    wd = Window.partitionBy("event_type").orderBy("adev", "event_id")
    devr = dev.withColumn("rn", F.row_number().over(wd)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    mad = devr.groupBy("event_type").agg(
        F.max("median_cents").alias("median_cents"),
        pick(devr, "adev").alias("mad_cents"),
        F.max("n").cast("long").alias("n_events"),
    )
    return (
        dev.join(mad.select("event_type", "mad_cents"), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("median_cents").cast("long").alias("median_cents"),
            F.max("mad_cents").cast("long").alias("mad_cents"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.when(
                    F.col("adev") > F.lit(K_MAD) * F.col("mad_cents"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )

"""State dwell-time analytics (round 8) — how long do users STAY in
each state? The SCD2 family derives the run history
(operators/scd_core.py); this rolls it up to the per-state duration
profile: closed-run counts, exact total dwell microseconds, and the
mean dwell — the "average session in 'error' lasts 40 minutes" table
that sits on every state-model dashboard.

No analog in the reference (SURVEY §2.1); events/state extension
surface completing scd / events_state / events_trans.

Determinism discipline: dwell is the difference of epoch MICROSECOND
integers (the parquet timestamps' native resolution), summed as exact
BIGINTs; the mean is one fp64 division of two exact integers. Open
(current) runs have no end and are excluded from dwell sums but
reported per state (n_open), so the row also shows how much of the
fleet is parked in each state right now.

Scale posture: the run derivation is the family's one user_id shuffle;
the roll-up aggregates |users| x |states|-bounded runs down to
|states| rows, map-side combinable. Nothing here pairs or collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.operators.scd_core import runs_from_events
from bigbugdata_spark.registry import register


@register(
    "evt_state_dwell",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, ts, event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                 - ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS island
            FROM events
        ),
        runs AS (
            SELECT user_id, event_type AS state, island,
                   MIN(ts) AS vf, MIN(event_id) AS first_eid
            FROM seq GROUP BY user_id, event_type, island
        ),
        spans AS (
            SELECT state,
                   epoch_us(LEAD(vf) OVER (
                       PARTITION BY user_id ORDER BY vf, first_eid))
                 - epoch_us(vf) AS dwell_us
            FROM runs
        )
        SELECT state,
               CAST(COUNT(dwell_us) AS BIGINT) AS n_closed,
               CAST(COUNT(*) - COUNT(dwell_us) AS BIGINT) AS n_open,
               CAST(COALESCE(SUM(dwell_us), 0) AS BIGINT) AS total_us,
               CASE WHEN COUNT(dwell_us) > 0
                    THEN CAST(SUM(dwell_us) AS DOUBLE) / COUNT(dwell_us)
               END AS mean_us
        FROM spans GROUP BY state
    """,
    tags=("events", "state", "window", "agg"),
)
def evt_state_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per state: closed-run count, open-run count, exact total dwell
    microseconds across closed runs, and the mean dwell (NULL if a
    state only ever appears as a user's current run). A run's dwell
    ends when the user's NEXT run begins — the same (vf, first_eid)
    chain the SCD2 valid_to uses, so dwell and validity can never
    disagree."""
    runs = runs_from_events(table(spark, sf_dir, "events"))
    hist = Window.partitionBy("user_id").orderBy("vf", "first_eid")
    spans = runs.select(
        "state",
        (
            F.unix_micros(F.lead("vf").over(hist)) - F.unix_micros("vf")
        ).alias("dwell_us"),
    )
    mean_us = F.when(
        F.count("dwell_us") > 0,
        F.sum("dwell_us").cast("double") / F.count("dwell_us"),
    )
    return spans.groupBy("state").agg(
        F.count("dwell_us").alias("n_closed"),
        (F.count(F.lit(1)) - F.count("dwell_us")).alias("n_open"),
        F.coalesce(F.sum("dwell_us"), F.lit(0)).cast("long").alias("total_us"),
        mean_us.alias("mean_us"),
    )

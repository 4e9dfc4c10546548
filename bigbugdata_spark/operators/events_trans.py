"""User-journey transition matrix (round 8) — the Markov-chain view of
the event stream: for every (previous event_type -> event_type) pair,
how many transitions occurred and what fraction of departures from the
previous state they represent. The product-analytics primitive behind
"after viewing, 40% purchase" funnels and behavioral drift monitoring.

No analog in the reference (SURVEY §2.1 — no window functions); event
analytics extension surface alongside evt_funnel / evt_retention.

Scale posture: one shuffle on user_id for the lag window (at 100 TB the
user-bucketed events layout in sources/bucketed.py makes it
shuffle-free), then a map-side-combinable aggregate whose key space is
|event_type|^2 (25 rows here) — the final exchange moves kilobytes. The
per-source-state totals are derived from the pair counts themselves
(roll-up, no second scan), and the probability is a single fp64
division of two exact BIGINTs, so both engines produce the identical
double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.caching import pin
from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register


@register(
    "evt_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_state
            FROM events
        ),
        pairs AS (
            SELECT prev_state, event_type AS state,
                   CAST(COUNT(*) AS BIGINT) AS n_trans
            FROM seq WHERE prev_state IS NOT NULL
            GROUP BY prev_state, event_type
        )
        SELECT prev_state, state, n_trans,
               CAST(SUM(n_trans) OVER (PARTITION BY prev_state) AS BIGINT)
                   AS n_from,
               CAST(n_trans AS DOUBLE)
                   / SUM(n_trans) OVER (PARTITION BY prev_state) AS p
        FROM pairs
    """,
    tags=("events", "window", "agg"),
)
def evt_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (prev_state, state) pair: transition count, total departures
    from prev_state, and the conditional transition probability
    p = n_trans / n_from.

    Event order within a user is (ts, event_id) — the same total order
    every state-model query in the repo uses (operators/scd_core.py), so
    ties on coarse timestamps cannot flip transitions between engines.
    """
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("state"),
            F.lag("event_type").over(w).alias("prev_state"),
        )
        .where(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "state")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    # departures-per-source-state as a roll-up of the 25-row pair frame
    # (window over the aggregate, NOT a second events scan)
    wfrom = Window.partitionBy("prev_state")
    return pairs.select(
        "prev_state",
        "state",
        "n_trans",
        F.sum("n_trans").over(wfrom).alias("n_from"),
        (F.col("n_trans").cast("double") / F.sum("n_trans").over(wfrom)).alias(
            "p"
        ),
    )

"""Last-touch purchase attribution (round 10) — the marketing-analytics
shape the events family lacked: every `purchase` event's value is
credited to the user's MOST RECENT preceding non-purchase event (the
"touch"); purchases with no preceding touch in the stream are
`organic`.  This is the classic single-pass attribution scan: one
window per user carries the last-seen touch type forward, so the
operator is a single shuffle on user_id followed by a per-type rollup.

Determinism: the stream's total order is (ts, event_id) — a purchase
sharing its timestamp with a touch sees that touch only if the touch's
event_id is smaller (ROWS ... 1 PRECEDING over the same total order on
both engines); money is integer cents end-to-end.

No analog in the reference (SURVEY §2.1); events extension surface.

Scale posture: one hash shuffle keyed on user_id (millions of
partitions' worth of distinct users at 100 TB — no single-task sort),
per-user frames are user-history-sized, and the carried state is ONE
column (the last touch type).  The rollup aggregates five touch types
map-side.  No self-join: the naive formulation (each purchase joins
every earlier event of its user, then argmax) pays |user history|^2;
the running window pays |user history|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL, cents_col
from bigbugdata_spark.registry import register

#: shared with the streaming twin (streaming/attrib.py) — stream ==
#: batch is the claim, so both register the SAME oracle
ATTRIB_ORACLE_SQL = f"""
    WITH carried AS (
        SELECT event_type,
               {CENTS_SQL} AS cents,
               LAST_VALUE(
                   CASE WHEN event_type <> 'purchase' THEN event_type END
                   IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS touch
        FROM events
    )
    SELECT COALESCE(touch, 'organic') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS attributed_cents
    FROM carried
    WHERE event_type = 'purchase'
    GROUP BY COALESCE(touch, 'organic')
"""


@register(
    "evt_purchase_attribution",
    oracle=ATTRIB_ORACLE_SQL,
    tags=("events", "window", "agg"),
)
def evt_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(touch_type, n_purchases, attributed_cents): each purchase's
    cents credited to the user's most recent preceding non-purchase
    event type in (ts, event_id) order, `organic` when none precedes —
    one user-keyed running window plus a tiny per-type rollup."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", cents_col().alias("cents")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("organic")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("attributed_cents"),
        )
    )

"""Sequential 3-step funnel with PER-STEP deadlines (round 12) —
evt_funnel generalized from "signup then anything within the hour" to
the product-analytics chain: first signup -> first click within SIX
HOURS of the signup -> first purchase within SIX HOURS of that click.
Earliest-qualifying-event semantics at every step (min over the
window), so the funnel is deterministic and each user advances at most
once per step; step-2's clock starts at the user's QUALIFYING click,
not the signup — the per-step deadline that distinguishes this from a
single lookahead window.

Exactness: all comparisons in integer epoch microseconds; conversion
rates are integer permille of the PREVIOUS step (truncating div).

No analog in the reference (SURVEY §2.1); events extension surface.

Scale posture: ONE events scan; t1/t2 are per-user window minimums
over the same user_id partitioning (exchange reuse — the evt_funnel
precedent), t3 and the booleans collapse in the per-user conditional
aggregate (already hash-partitioned, no second shuffle), and the
funnel total is a single-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

STEP_WINDOW_US = 6 * 3_600_000_000  # six hours: every step live on the fixture

_FUNNEL_STEPS_ORACLE_SQL = f"""
    WITH t1 AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t1_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    t2 AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2_us
        FROM events e JOIN t1 ON e.user_id = t1.user_id
        WHERE e.event_type = 'click'
          AND epoch_us(e.ts) > t1.t1_us
          AND epoch_us(e.ts) <= t1.t1_us + {STEP_WINDOW_US}
        GROUP BY e.user_id
    ),
    t3 AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3_us
        FROM events e JOIN t2 ON e.user_id = t2.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) > t2.t2_us
          AND epoch_us(e.ts) <= t2.t2_us + {STEP_WINDOW_US}
        GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_signup,
           CAST((SELECT COUNT(*) FROM t2) AS BIGINT) AS n_click_6h,
           CAST((SELECT COUNT(*) FROM t3) AS BIGINT) AS n_purchase_6h,
           CAST((SELECT COUNT(*) FROM t2) * 1000
                // GREATEST((SELECT COUNT(*) FROM t1), 1) AS BIGINT)
               AS click_conv_pm,
           CAST((SELECT COUNT(*) FROM t3) * 1000
                // GREATEST((SELECT COUNT(*) FROM t2), 1) AS BIGINT)
               AS purchase_conv_pm
"""


@register(
    "evt_funnel_steps",
    oracle=_FUNNEL_STEPS_ORACLE_SQL,
    tags=("events", "window", "agg"),
)
def evt_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_signup, n_click_6h, n_purchase_6h, click_conv_pm,
    purchase_conv_pm): users reaching each step of the
    signup -> click(+6h) -> purchase(+6h) chain, with per-step
    conversion in integer permille of the previous step."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w_user = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("us"))).over(
        w_user
    )
    with_t1 = ev.withColumn("t1_us", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("us") > F.col("t1_us"))
            & (F.col("us") <= F.col("t1_us") + STEP_WINDOW_US),
            F.col("us"),
        )
    ).over(w_user)
    with_t2 = with_t1.withColumn("t2_us", t2)
    per_user = with_t2.groupBy("user_id").agg(
        F.max(F.col("t1_us").isNotNull()).alias("s1"),
        F.max(F.col("t2_us").isNotNull()).alias("s2"),
        F.max(
            (F.col("event_type") == "purchase")
            & (F.col("us") > F.col("t2_us"))
            & (F.col("us") <= F.col("t2_us") + STEP_WINDOW_US)
        ).alias("s3"),
    )
    # coalesce(0): SUM over an EMPTY events table is NULL while the
    # oracle's scalar COUNT subqueries return zeros (r13 review
    # finding — shared with the streaming twin's empty-emission case)
    return per_user.agg(
        F.coalesce(F.sum(F.when(F.col("s1"), 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_signup"),
        F.coalesce(
            F.sum(F.when(F.col("s1") & F.col("s2"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_click_6h"),
        F.coalesce(
            F.sum(
                F.when(F.col("s1") & F.col("s2") & F.col("s3"), 1).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_purchase_6h"),
    ).select(
        "n_signup",
        "n_click_6h",
        "n_purchase_6h",
        F.expr("n_click_6h * 1000 div greatest(n_signup, 1)")
        .cast("long")
        .alias("click_conv_pm"),
        F.expr("n_purchase_6h * 1000 div greatest(n_click_6h, 1)")
        .cast("long")
        .alias("purchase_conv_pm"),
    )

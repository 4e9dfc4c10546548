"""Multi-touch (linear) purchase attribution (round 12) — the
path-based counterpart of evt_purchase_attribution's last-touch model:
every purchase's value is split EVENLY across all the user's touches on
its conversion path (the non-purchase events since the user's previous
purchase, exclusive, in (ts, event_id) order); purchases with an empty
path stay `organic`.  Marketing stacks run last-touch and linear
side-by-side — the delta between them is the standard "assist" signal.

Exactness: credits are integer cents — each of a path's k touches gets
cents div k, and the remainder (cents mod k) goes to the path's LAST
touch (the deterministic tie-break), so SUM(credited) == SUM(cents)
conserves to the cent and the oracle hash-matches bit-for-bit.  Both
engines derive the identical segmentation from the same window.

No analog in the reference (SURVEY §2.1); events extension surface.

Scale posture: ONE hash shuffle on user_id feeds both windows (purchase
sequence numbers and path ranks are per-user running counts over the
same (ts, event_id) order — exchange reuse keeps it one shuffle), then
touches join purchases on (user_id, seg): equi-join on the
already-co-partitioned key, skinny rows (ids + type + cents), candidate
volume = touch rows, never |history|^2.  The rollup is a five-key
map-side agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL, cents_col
from bigbugdata_spark.registry import register

MTA_ORACLE_SQL = f"""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               {CENTS_SQL} AS cents,
               -- purchases BEFORE this row (so a purchase row's own
               -- segment is the path it closes)
               COUNT(*) FILTER (event_type = 'purchase')
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS seg
        FROM events
    ),
    touches AS (
        SELECT user_id, seg, event_type AS touch_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, seg
                                  ORDER BY ts, event_id) AS trn,
               COUNT(*) OVER (PARTITION BY user_id, seg) AS k
        FROM ordered WHERE event_type <> 'purchase'
    ),
    purchases AS (
        SELECT user_id, seg, cents FROM ordered
        WHERE event_type = 'purchase'
    ),
    credited AS (
        SELECT t.touch_type,
               p.cents // t.k
                   + CASE WHEN t.trn = t.k THEN p.cents % t.k ELSE 0 END
                   AS credit
        FROM purchases p JOIN touches t
          ON p.user_id = t.user_id AND p.seg = t.seg
    ),
    organic AS (
        SELECT 'organic' AS touch_type, p.cents AS credit
        FROM purchases p
        WHERE NOT EXISTS (
            SELECT 1 FROM touches t
            WHERE t.user_id = p.user_id AND t.seg = p.seg
        )
    )
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(SUM(credit) AS BIGINT) AS credited_cents
    FROM (SELECT * FROM credited UNION ALL SELECT * FROM organic)
    GROUP BY touch_type
"""


@register(
    "evt_multi_touch_attribution",
    oracle=MTA_ORACLE_SQL,
    tags=("events", "window", "agg", "join"),
)
def evt_multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(touch_type, n_credits, credited_cents) under the LINEAR model:
    each purchase's cents split cents-div-k across its path's k touches,
    remainder to the path's last touch; empty paths credit 'organic'.
    Total credited cents conserve exactly (unit test pins conservation
    against evt_purchase_attribution's total)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", cents_col().alias("cents")
    )
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        F.count(F.when(F.col("event_type") == "purchase", 1)).over(
            w_order.rowsBetween(Window.unboundedPreceding, -1)
        )
    ).alias("seg")
    ordered = ev.select("user_id", "event_type", "cents", "ts", "event_id", seg)

    w_seg = Window.partitionBy("user_id", "seg")
    touches = (
        ordered.filter(F.col("event_type") != "purchase")
        .withColumn("trn", F.row_number().over(w_seg.orderBy("ts", "event_id")))
        .withColumn("k", F.count(F.lit(1)).over(w_seg))
        .select("user_id", "seg", F.col("event_type").alias("touch_type"), "trn", "k")
    )
    purchases = ordered.filter(F.col("event_type") == "purchase").select(
        "user_id", "seg", "cents"
    )
    credited = purchases.join(touches, ["user_id", "seg"]).select(
        "touch_type",
        (
            F.expr("cents div k")
            + F.when(F.col("trn") == F.col("k"), F.expr("cents % k")).otherwise(
                F.lit(0)
            )
        ).alias("credit"),
    )
    organic = (
        purchases.join(
            touches.select("user_id", "seg").distinct(),
            ["user_id", "seg"],
            "left_anti",
        )
        .select(F.lit("organic").alias("touch_type"), F.col("cents").alias("credit"))
    )
    return (
        credited.unionByName(organic)
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_credits"),
            F.sum("credit").cast("long").alias("credited_cents"),
        )
    )

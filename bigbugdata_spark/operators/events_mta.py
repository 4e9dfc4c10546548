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

Scale posture: ONE events scan, no self-join (r12 plan audit: the
first cut derived touches and purchases as separate branches of a CTE
and paid FOUR scans).  Window-only derivation: the user_id-ordered
window assigns segments and carries each row's NEXT purchase cents
forward-looking (first purchase at-or-after); the (user_id, seg)
window counts the segment's touches (k) and the running touch rank.
Two skinny hash shuffles (user_id, then its (user_id, seg)
refinement), per-user frames user-history-sized, never |history|^2.
The rollup is a five-key map-side agg.
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
    is_p = F.col("event_type") == "purchase"
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rows = ev.select(
        "user_id",
        "event_type",
        "cents",
        "ts",
        "event_id",
        F.count(F.when(is_p, 1))
        .over(w_order.rowsBetween(Window.unboundedPreceding, -1))
        .alias("seg"),
        # each row's crediting purchase: the first purchase at-or-after
        # (for a touch that is strictly the NEXT purchase; a trailing
        # touch with no following purchase gets NULL and credits nothing)
        F.first(F.when(is_p, F.col("cents")), ignorenulls=True)
        .over(w_order.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        .alias("p_cents"),
    )
    w_seg = Window.partitionBy("user_id", "seg")
    w_seg_run = w_seg.orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    touch_one = F.when(~is_p, 1).otherwise(0)
    rows = rows.withColumn("k", F.sum(touch_one).over(w_seg)).withColumn(
        "trn", F.sum(touch_one).over(w_seg_run)
    )
    credits = rows.filter(
        (~is_p & F.col("p_cents").isNotNull()) | (is_p & (F.col("k") == 0))
    ).select(
        F.when(is_p, F.lit("organic")).otherwise(F.col("event_type")).alias(
            "touch_type"
        ),
        F.when(is_p, F.col("cents"))
        .otherwise(
            F.expr("p_cents div k")
            + F.when(F.col("trn") == F.col("k"), F.expr("p_cents % k")).otherwise(
                F.lit(0)
            )
        )
        .alias("credit"),
    )
    return credits.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.sum("credit").cast("long").alias("credited_cents"),
    )

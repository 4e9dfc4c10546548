"""Daily value-quantile trend (round 10) — the time-sliced sibling of
evt_value_quantiles and the second consumer of the round-10 histogram
pattern: per (event_type, day), the exact rank-selected p50 and p95 of
the event value plus the day's volume.  This is the panel an ops
dashboard actually plots ("p95 purchase value by day") and the input a
latency/value SLO burn-rate check reads; the global per-type quantiles
cannot show a drifting day.

No analog in the reference (SURVEY §2.1); events/dq extension surface.

Determinism: rank-selected discrete quantiles (value at row ceil(q*n)
of the value-sorted group — evt_value_quantiles' convention, no
interpolation), exact integer cents; day strings via the pinned date
format on both engines.

Scale posture: the raw events are touched once by a
map-side-combinable groupBy keyed (type, day, cents) — the shuffle
spreads over the full key space; each quantile is a cumulative-count
window over HISTOGRAM rows, whose per-(type, day) cardinality is the
day's distinct-value count (value-domain bounded), never the raw event
count — the evt_anomaly_mad r10 rework's plan shape, reused.  Output
is |types| x |days| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL, cents_col
from bigbugdata_spark.registry import register

QUANTILES = ((50, "p50_cents"), (95, "p95_cents"))

_QTREND_SQL = f"""
    WITH ranked AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               {CENTS_SQL} AS cents,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
                   ORDER BY {CENTS_SQL}
               ) AS rn,
               COUNT(*) OVER (
                   PARTITION BY event_type, strftime(ts, '%Y-%m-%d')
               ) AS n
        FROM events
    )
    SELECT event_type, day,
           CAST(MAX(n) AS BIGINT) AS n_events,
           {", ".join(
               f"CAST(MAX(CASE WHEN rn = CAST(CEIL({q / 100} * n) AS BIGINT) "
               f"THEN cents END) AS BIGINT) AS {alias}"
               for q, alias in QUANTILES
           )}
    FROM ranked GROUP BY event_type, day
"""


@register(
    "evt_quantile_trend",
    oracle=_QTREND_SQL,
    tags=("events", "dq", "window", "agg"),
)
def evt_quantile_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, n_events, p50_cents, p95_cents): exact daily
    discrete quantiles per type, rank-selected over the (type, day,
    cents) value histogram — raw events are touched once, every
    ordered pass is distinct-value-sized (the evt_anomaly_mad plan
    shape; the oracle rank-selects over raw rows, which is provably
    the same value)."""
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        cents_col().alias("cents"),
    )
    hist = ev.groupBy("event_type", "day", "cents").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wcum = (
        Window.partitionBy("event_type", "day")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("event_type", "day")
    h = hist.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wn)
    )
    picks = []
    for q, alias in QUANTILES:
        target = F.ceil(F.lit(q / 100) * F.col("n")).cast("long")
        picks.append(
            h.filter(F.col("cum") >= target)
            .groupBy("event_type", "day")
            .agg(F.min("cents").alias(alias))
        )
    counts = hist.groupBy("event_type", "day").agg(
        F.sum("cnt").cast("long").alias("n_events")
    )
    out = counts
    for p in picks:
        out = out.join(p, ["event_type", "day"])
    return out

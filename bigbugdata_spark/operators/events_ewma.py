"""Exponentially-weighted daily smoothing (round 10) — the EWMA trend
panel per event type: each day's smoothed activity level next to the
raw level, the standard operational-dashboard primitive between the
raw daily series (evt_growth_accounting) and the seasonality profile
(evt_seasonality_profile), and the usual baseline an anomaly monitor
(evt_anomaly_mad) is compared against.

No analog in the reference (SURVEY §2.1); events extension surface.

Determinism (the bit-exact-oracle trick): with decay 1/2 and a
20-day horizon every weight is a DYADIC rational 2^-k built by integer
shift (never ``pow``, whose libm rounding differs between engines), so
every term cents * 2^-k is an integer multiple of 2^-19 and every
partial sum stays exactly representable while the weighted total is
below 2^34 — the sum is association-free and both engines round the
single final division identically (IEEE).  The truncated-window weight
mass has the closed form sum_{k=0..m} 2^-k = 2 - 2^-m, also dyadic.

Scale posture: the raw scan collapses to the (event_type, day) panel in
ONE map-side-combinable aggregate; the 20-day lookback is a range
self-join on the PANEL (types x days rows — cardinality-bounded by the
calendar at any corpus size, never by event volume), so the quadratic
piece runs on a frame that stays tiny at 100 TB.  Days with no events
contribute zero mass without materializing calendar gaps.

The exactness precondition (weighted 20-day totals < 2^34 cents, i.e.
partial sums < 2^53 ulps of 2^-19) holds with two orders of magnitude
of margin at every local gate SF — asserted by
tests/test_round10_ops.py::test_ewma_exactness_bound_at_gate_sfs, the
guard the docstring claim rides on.  Beyond the bound (hot types at
cluster scale) the result degrades gracefully to ordinary
double-precision smoothing; only last-ulp oracle parity is lost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.caching import pin
from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL, cents_col
from bigbugdata_spark.registry import register

EWMA_WINDOW = 20  # lookback days; weights 2^0 .. 2^-(W-1)

_EWMA_SQL = f"""
    WITH daily AS (
        SELECT event_type,
               CAST(ts AS DATE) AS day,
               CAST(SUM({CENTS_SQL}) AS BIGINT) AS n_cents
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    d0 AS (SELECT MIN(day) AS day0 FROM daily),
    idx AS (
        SELECT event_type, day, n_cents,
               datediff('day', day0, day) AS d_idx
        FROM daily, d0
    )
    SELECT a.event_type,
           strftime(a.day, '%Y-%m-%d') AS day,
           a.n_cents,
           SUM(b.n_cents * (1.0 / (1 << (a.d_idx - b.d_idx))))
               / (2 - 1.0 / (1 << LEAST({EWMA_WINDOW - 1}, a.d_idx)))
               AS ewma_cents
    FROM idx a
    JOIN idx b
      ON a.event_type = b.event_type
     AND b.d_idx BETWEEN a.d_idx - {EWMA_WINDOW - 1} AND a.d_idx
    GROUP BY a.event_type, a.day, a.n_cents, a.d_idx
"""


@register(
    "evt_ewma_daily",
    oracle=_EWMA_SQL,
    tags=("events", "window", "timeseries"),
)
def evt_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, n_cents, ewma_cents): the raw daily centi-value
    total and its exponentially-weighted moving average (decay 1/2,
    20-day horizon, truncated-window weights renormalized by the exact
    geometric mass 2 - 2^-m) — the smoothed activity baseline per type."""
    ev = table(spark, sf_dir, "events")
    # pin the panel: both join sides AND the day0 scalar reuse it —
    # without the pin each consumer re-scans and re-aggregates the raw
    # events (4 scans of the 100 TB table for one calendar-sized frame)
    daily = pin(
        ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.sum(cents_col()).cast("long").alias("n_cents")
        )
    )
    day0 = daily.agg(F.min("day").alias("day0"))
    idx = daily.crossJoin(F.broadcast(day0)).select(
        "event_type",
        "day",
        "n_cents",
        F.datediff("day", "day0").alias("d_idx"),
    )
    a, b = idx.alias("a"), idx.alias("b")
    # dyadic weight 2^-lag via integer shift — bit-exact in both engines
    # (never pow(), whose libm rounding can differ)
    w = F.expr("1.0 / cast(shiftleft(1, a.d_idx - b.d_idx) as double)")
    mass = F.expr(
        f"2.0 - 1.0 / cast(shiftleft(1, least({EWMA_WINDOW - 1}, d_idx))"
        " as double)"
    )
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("b.d_idx") >= F.col("a.d_idx") - (EWMA_WINDOW - 1))
            & (F.col("b.d_idx") <= F.col("a.d_idx")),
        )
        .groupBy(
            F.col("a.event_type").alias("event_type"),
            F.col("a.day").alias("day_d"),
            F.col("a.n_cents").alias("n_cents"),
            F.col("a.d_idx").alias("d_idx"),
        )
        .agg(F.sum(F.col("b.n_cents") * w).alias("num"))
        .select(
            "event_type",
            F.date_format("day_d", "yyyy-MM-dd").alias("day"),
            "n_cents",
            (F.col("num") / mass).alias("ewma_cents"),
        )
    )

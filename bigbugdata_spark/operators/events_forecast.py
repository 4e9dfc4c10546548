"""Seasonal-naive forecast BACKTEST (round 11) — the capacity-planning
baseline every volume forecast is judged against, run as a relational
operator: predict each (event_type, day)'s revenue by the same weekday
one week earlier (the seasonal-naive rule), score the prediction
against the actual, and report per-type backtest error — exact MAE and
signed bias in integer cents, plus the scored-day count.  A "real"
model earns its complexity only by beating this card; shipping the
baseline's backtest as a first-class query is the standard forecasting
hygiene (and the relational shape is one panel self-join).

No analog in the reference (SURVEY §2.1); events/evaluation extension
surface next to evt_ewma_daily (smoothing) and evt_seasonality_profile
(the weekly structure this baseline exploits).

Determinism: the panel is exact integer cents per (type, day); the
7-day lag is a calendar join on the string day key (date arithmetic in
each engine's own date type, formatted identically); MAE/bias stay
INTEGER via floor division by the scored-day count (documented
convention — a capacity card reads whole cents).

Scale posture: raw events collapse to the (type, day) panel in one
map-side-combinable aggregate (the r10 histogram pattern); the lag
join, scoring, and rollup are all panel-sized — calendar-bounded at
any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL, cents_col
from bigbugdata_spark.registry import register

LAG_DAYS = 7

_FORECAST_SQL = f"""
    WITH panel AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(SUM({CENTS_SQL}) AS BIGINT) AS cents
        FROM events GROUP BY event_type, day
    ),
    scored AS (
        SELECT a.event_type,
               a.cents AS actual,
               p.cents AS predicted
        FROM panel a
        JOIN panel p ON p.event_type = a.event_type
           AND p.day = strftime(CAST(a.day AS DATE) - {LAG_DAYS}, '%Y-%m-%d')
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           CAST(SUM(ABS(actual - predicted)) // COUNT(*) AS BIGINT)
               AS mae_cents,
           CAST(SUM(actual - predicted) // COUNT(*) AS BIGINT)
               AS bias_cents
    FROM scored GROUP BY event_type
"""


@register(
    "evt_forecast_seasonal_naive",
    oracle=_FORECAST_SQL,
    tags=("events", "agg", "join"),
)
def evt_forecast_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_days_scored, mae_cents, bias_cents): backtest of
    the seasonal-naive rule (predict day d by day d-LAG_DAYS) over the
    daily revenue panel — exact integer MAE and signed bias per type;
    only days with a week-earlier observation score."""
    panel = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(F.sum(cents_col()).alias("cents"))
    )
    pred = panel.select(
        "event_type",
        F.date_format(
            F.date_add(F.to_date("day"), LAG_DAYS), "yyyy-MM-dd"
        ).alias("day"),
        F.col("cents").alias("predicted"),
    )
    scored = panel.withColumnRenamed("cents", "actual").join(
        pred, ["event_type", "day"]
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days_scored"),
        F.expr("sum(abs(actual - predicted)) div count(1)").alias("mae_cents"),
        F.expr("sum(actual - predicted) div count(1)").alias("bias_cents"),
    )

"""evt_value_quantiles as its own single-registration module (r12).

Split out of operators/events.py for two registration-order reasons:
(1) streaming/quantiles.py needs this query's oracle at import time —
importing the 8-query events module from inside the driver cap would
drag all of its registrations in (the r11 comment's "re-check if
reordered" hazard, now permanent-proofed via the scd_core pattern:
the oracle constant lives in the non-registering events_quant_core.py);
(2) the r12 rotation backfills the stalest driver verdicts, and this
r5-era query re-enters the cap alone without spending 8 slots.

Semantics, implementation, and oracle are events.py's verbatim (moved,
not changed — the oracle string is byte-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import cents_col as _cents_col
from bigbugdata_spark.operators.events_quant_core import QUANTILES_ORACLE_SQL
from bigbugdata_spark.registry import register


@register(
    "evt_value_quantiles",
    oracle=QUANTILES_ORACLE_SQL,
    tags=("events", "window", "agg", "headline"),
)
def evt_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles (p50/p90/p99) of the event value per
    type: rank-based selection (value at row ceil(q*n) of the sorted
    group) — no interpolation, no sketch, so the result is integer-exact
    and engine-independent. One shuffle on event_type for the window.

    Scale note: exact quantiles need a per-group sort — right up to the
    point a single group outgrows a partition; past that, the approximate
    path is percentile_approx (a positive-error GK sketch) whose results
    are Spark-specific and therefore deliberately NOT oracle-gated here."""
    ev = table(spark, sf_dir, "events")
    ranked = ev.select(
        "event_type",
        _cents_col().alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ranked.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )

    def pick(q: float):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("long"),
                F.col("cents"),
            )
        )

    return ranked.groupBy("event_type").agg(
        pick(0.5).cast("long").alias("p50_cents"),
        pick(0.9).cast("long").alias("p90_cents"),
        pick(0.99).cast("long").alias("p99_cents"),
        F.max("n").cast("long").alias("n_events"),
    )

"""Streaming distribution-drift monitor (round 8) — the continuous twin
of operators/dq_drift.dq_distribution_drift: the categorical-mix check
runs as a complete-mode streaming aggregate so the dataset-card table
is live while the feed ingests, instead of a nightly batch audit.

Topology: the events STREAM feeds the same one-scan conditional
aggregation (per event_type, counts on each side of the cutoff); the
window totals and the exact-integer drift flag are a finishing select
over the |event_type|-row complete-mode table (post-sink, batch-side —
a streaming query cannot nest an unpartitioned window, and the final
roll-up is over a dataset-card-sized frame anyway). availableNow over
the fixture makes the final table equal the batch derivation, so the
SAME oracle SQL gates both.

Scale posture: state is |event_type| rows of two BIGINT sums —
constant-size streaming state, no watermark needed (the aggregate never
drops keys); the production variant swaps the memory sink for the
idempotent MERGE sink (streaming/sink.py) on the same tiny key space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.operators.dq_drift import (
    DRIFT_CUTOFF,
    DRIFT_THRESHOLD_PM,
)
from bigbugdata_spark.registry import REGISTRY, register
from bigbugdata_spark.streaming.core import _run_to_memory, stream_events


def _window_counts(ev: DataFrame) -> DataFrame:
    """Shared streaming-safe stage: per event_type, conditional counts
    on each side of the drift cutoff (one pass, map-side combinable)."""
    cutoff = F.lit(DRIFT_CUTOFF).cast("timestamp")
    return ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0)).alias("c_cur"),
    )


def _finish_drift(counts: DataFrame) -> DataFrame:
    """Totals + permille delta + exact-integer flag over the tiny
    per-category frame — identical arithmetic to the batch query."""
    w = Window.partitionBy()
    counts = counts.select(
        "event_type",
        "c_ref",
        "c_cur",
        F.sum("c_ref").over(w).alias("n_ref"),
        F.sum("c_cur").over(w).alias("n_cur"),
    )
    delta_pm = (
        F.col("c_cur").cast("double") / F.col("n_cur")
        - F.col("c_ref").cast("double") / F.col("n_ref")
    ) * 1000
    drift = (
        F.abs(F.col("c_cur") * F.col("n_ref") - F.col("c_ref") * F.col("n_cur"))
        * 1000
        > F.lit(DRIFT_THRESHOLD_PM) * F.col("n_ref") * F.col("n_cur")
    )
    return counts.select(
        "event_type",
        "c_ref",
        "c_cur",
        "n_ref",
        "n_cur",
        delta_pm.alias("delta_pm"),
        drift.cast("int").alias("drift"),
    )


@register(
    "dq_stream_distribution_drift",
    # the batch query's oracle VERBATIM — stream == batch is the claim
    # (the module-top import of operators.dq_drift registered it)
    oracle=REGISTRY["dq_distribution_drift"].oracle,
    tags=("streaming", "dq", "events", "agg"),
)
def dq_stream_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift monitor as a live streaming aggregate: ingest the
    events fixture with availableNow, keep per-category window counts
    as complete-mode state, and derive totals/flags from the final
    table. Gated by the identical oracle as the batch query."""
    counts = _run_to_memory(_window_counts(stream_events(spark, sf_dir)), "complete")
    return _finish_drift(counts)

"""Structured Streaming twins of the event-time window operators
(SURVEY.md §7 phase 3: "streaming semantics on events"). The reference is
strictly batch (SURVEY §2.1); these run the SAME logical window plans as
operators/events.py as continuous queries — readStream file source ->
watermarked window aggregation -> memory sink, driven to completion with
the availableNow trigger so results are deterministic and testable.

Streaming posture for 100 TB/day: the file source scales by partitioned
directory listing (maxFilesPerTrigger bounds batch size), state lives in
the window/session state store keyed by (window, key) and is expired by
the watermark — the 10-minute delay bounds state to ~10 min of keys.

Semantics notes (asserted in tests/test_streaming.py):
* complete mode + availableNow reproduces the batch tumbling result
  EXACTLY (all state retained, flushed at end) — so the streaming query
  is oracle-checkable against the same DuckDB SQL as the batch twin;
* append mode emits only windows finalized by the final watermark
  (window.end <= max(ts) - delay); the held-back tail windows are the
  documented difference vs batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.functions.fragments import TS_FMT, cents_col as _cents_col
from bigbugdata_spark.registry import register
from bigbugdata_spark.streaming.core import _run_to_memory, stream_events


def _tumbling_agg(events: DataFrame) -> DataFrame:
    """The shared tumbling-window aggregation (same plan as the batch
    evt_tumbling_window, minus the final formatting)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents_col()).alias("value_cents"),
        )
    )


def stream_tumbling_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling counts, COMPLETE mode: equals the batch
    result exactly once the stream drains."""
    out = _run_to_memory(_tumbling_agg(stream_events(spark, sf_dir)), "complete")
    return out.select(
        F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
        "event_type",
        "n_events",
        "value_cents",
    )


def stream_tumbling_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling counts, APPEND mode: only windows whose end
    precedes the final watermark (max ts - 10 min) are emitted — the
    late-data/finalization demo."""
    out = _run_to_memory(_tumbling_agg(stream_events(spark, sf_dir)), "append")
    return out.select(
        F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
        "event_type",
        "n_events",
        "value_cents",
    )


# oracle: identical to the batch twin — complete-mode availableNow
# streaming reproduces it exactly
@register(
    "evt_stream_tumbling",
    oracle="""
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S.%f') AS window_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM events
        GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
    """,
    tags=("events", "streaming"),
    side_effects=True,
)
def evt_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming tumbling-window query, registered through the same
    correctness gate as every batch operator: the driver's oracle compare
    holds because complete-mode availableNow drains the whole file into
    the window state and flushes it — a real Structured Streaming
    execution (state store, watermark tracking, memory sink), not a
    batch rewrite."""
    return stream_tumbling_complete(spark, sf_dir)

"""Stream-stream JOIN — the one Structured Streaming surface the other
streaming modules don't cover (windows: aggregation; stateful:
applyInPandasWithState; dedup: dropDuplicatesWithinWatermark). The
reference is strictly batch (SURVEY §2.1), so like the rest of
bigbugdata_spark/streaming this is pure extension surface.

The query is click->view attribution: each click joins the same user's
views from the preceding 30 minutes. As a stream-stream INNER join Spark
requires exactly what the 100 TB posture needs anyway:

* a watermark on BOTH sides — join state (buffered unmatched rows) is
  evicted once the other side's watermark passes the range bound, so
  state is bounded to ~(delay + range) minutes of events per side;
* an event-time RANGE condition tying the two streams — Spark derives
  each side's state-retention horizon from it.

Correctness contract: an inner stream-stream join emits a pair as soon
as both rows have arrived (the watermark only bounds state eviction, it
never delays inner-join output), and the availableNow trigger ingests
the whole fixture before any watermark advances — so the streamed result
is row-identical to the batch join, which is exactly the registered
DuckDB oracle. tests/test_streaming.py additionally pins stream == batch
through the Spark engine itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import TS_FMT, TS_FMT_DUCK as _TS_FMT_DUCK
from bigbugdata_spark.registry import register
from bigbugdata_spark.streaming.core import _run_to_memory, stream_events

_RANGE = "30 minutes"
_DELAY = "10 minutes"


def _attribution_join(clicks: DataFrame, views: DataFrame) -> DataFrame:
    """The shared join plan: user equi-key + event-time range.

    The equi-key keeps the join hash-partitioned on user_id (one shuffle
    per side, batch or stream); the range condition is a residual — and
    in streaming, the horizon Spark evicts state by."""
    joined = clicks.join(
        views,
        F.expr(
            "click_user = view_user AND "
            f"view_ts >= click_ts - INTERVAL {_RANGE} AND view_ts <= click_ts"
        ),
    )
    return joined.select(
        F.col("click_user").alias("user_id"),
        "click_id",
        "view_id",
        F.date_format("click_ts", TS_FMT).alias("click_ts"),
        F.date_format("view_ts", TS_FMT).alias("view_ts"),
    )


def _sides(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("view_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    return clicks, views


def batch_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin over the same plan (the stream == batch test anchor)."""
    clicks, views = _sides(table(spark, sf_dir, "events"))
    return _attribution_join(clicks, views)


@register(
    "evt_stream_click_attribution",
    oracle=f"""
        SELECT c.user_id,
               c.event_id AS click_id,
               v.event_id AS view_id,
               strftime(c.ts, '{_TS_FMT_DUCK}') AS click_ts,
               strftime(v.ts, '{_TS_FMT_DUCK}') AS view_ts
        FROM events c
        JOIN events v
          ON c.user_id = v.user_id
         AND v.ts >= c.ts - INTERVAL '30 minutes'
         AND v.ts <= c.ts
        WHERE c.event_type = 'click' AND v.event_type = 'view'
    """,
    tags=("events", "streaming", "join"),
    side_effects=True,
)
def evt_stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join, driven to completion with
    availableNow and returned as a static frame (same pattern as
    evt_stream_tumbling). Oracle-exact per the module contract: inner
    join output is never held back by the watermark, and the single
    availableNow batch ingests every row before eviction starts."""
    clicks_raw, views_raw = _sides(stream_events(spark, sf_dir))
    clicks = clicks_raw.withWatermark("click_ts", _DELAY)
    views = views_raw.withWatermark("view_ts", _DELAY)
    return _run_to_memory(_attribution_join(clicks, views), "append")

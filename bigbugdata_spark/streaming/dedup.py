"""Streaming deduplication — exact dedup at ingest time, the streaming
twin of operators/dedup.dedup_exact. `dropDuplicatesWithinWatermark`
over a watermarked stream keeps one row per key in the state store and
expires that key's state once the watermark passes its first-seen event
time (bounded state: only keys seen within the delay window are
retained — the standard exactly-once ingest-dedup pattern for a feed
that can redeliver).

Why not plain `dropDuplicates(keys)`: when the event-time column is NOT
part of the dedup key subset, `dropDuplicates` never evicts — Spark only
purges dedup state when the watermark column is one of the keys — so on
an unbounded redelivering feed state grows without bound (ADVICE r2 #1).
`dropDuplicatesWithinWatermark` exists precisely for this case: dedup on
a key subset with eviction driven by the stream's watermark. Semantics:
duplicates are guaranteed dropped when they arrive within the watermark
delay of the first sighting — redeliveries later than the delay can
resurface, which is the correct contract for at-least-once feeds whose
redelivery lag is bounded by the delay.

Demo keys on (user_id, event_type, value) — the events table has no
natural duplicate key, so the test dedups a stream of REDELIVERED events
(the same file read twice via two globs) and asserts the result equals
the batch distinct."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.functions.fragments import CENTS_SQL
from bigbugdata_spark.registry import register
from bigbugdata_spark.streaming.core import _run_to_memory, stream_events

DEDUP_KEYS = ["user_id", "event_type", "value_cents"]


def _keyed(events: DataFrame) -> DataFrame:
    from bigbugdata_spark.functions.fragments import cents_col as _cents_col

    return events.select(
        "user_id",
        "event_type",
        _cents_col().alias("value_cents"),
        "ts",
    )


@register(
    "evt_stream_dedup",
    # the cents convention comes from the shared fragment so a change
    # there can never silently diverge from _keyed's cents_col()
    oracle=f"""
        SELECT DISTINCT user_id, event_type,
               {CENTS_SQL} AS value_cents
        FROM events
    """,
    tags=("streaming", "dedup"),
    side_effects=True,
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup: one surviving row per key, with key
    state evicted once the watermark passes 10 minutes beyond the key's
    first event time — bounded state on an unbounded feed (see module
    docstring for why dropDuplicatesWithinWatermark, not
    dropDuplicates)."""
    events = _keyed(stream_events(spark, sf_dir))
    deduped = events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        DEDUP_KEYS
    )
    return _run_to_memory(deduped.select(*DEDUP_KEYS), "append")


def batch_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch equivalent the test compares against."""
    from bigbugdata_spark.catalog import table

    return _keyed(table(spark, sf_dir, "events")).select(*DEDUP_KEYS).distinct()

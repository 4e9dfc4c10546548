"""Streaming deduplication — exact dedup at ingest time, the streaming
twin of operators/dedup.dedup_exact. `dropDuplicates` over a watermarked
stream keeps one row per key in the state store and expires key state
once the watermark passes (bounded state: only keys seen within the
delay window are retained — the standard exactly-once ingest-dedup
pattern for a feed that can redeliver).

Demo keys on (user_id, event_type, value) — the events table has no
natural duplicate key, so the test dedups a stream of REDELIVERED events
(the same file read twice via two globs) and asserts the result equals
the batch distinct."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.streaming.windows import _run_to_memory, stream_events

DEDUP_KEYS = ["user_id", "event_type", "value_cents"]


def _keyed(events: DataFrame) -> DataFrame:
    from bigbugdata_spark.operators.events import _cents_col

    return events.select(
        "user_id",
        "event_type",
        _cents_col().alias("value_cents"),
        "ts",
    )


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup: one surviving row per key among
    events whose event times fall within the watermark horizon; state
    for keys older than (max event time - 10 min) is dropped, which is
    what makes this run forever on an unbounded feed."""
    events = _keyed(stream_events(spark, sf_dir))
    deduped = events.withWatermark("ts", "10 minutes").dropDuplicates(DEDUP_KEYS)
    return _run_to_memory(deduped.select(*DEDUP_KEYS), "append")


def batch_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch equivalent the test compares against."""
    from bigbugdata_spark.catalog import table

    return _keyed(table(spark, sf_dir, "events")).select(*DEDUP_KEYS).distinct()

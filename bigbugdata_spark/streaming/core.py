"""Shared Structured-Streaming plumbing: the events file-source stream
and the drive-to-memory-sink test harness.

Split out of streaming/windows.py for a registration-order reason (the
same one behind functions/fragments.py): windows.py registers a query at
import time, but sink.py / dedup.py / stateful.py / joins.py only need
these helpers — importing them must not perturb the registry order the
driver's capped correctness report depends on (registry._QUERY_MODULES).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# physical schema of events.parquet under nanosAsLong (session.py): the
# streaming source needs an explicit schema
_EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_name_counter = itertools.count()


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as an unbounded file-source stream (nanos -> micros
    conversion identical to the batch catalog)."""
    # nanos + UTC confs are runtime-settable — required even on sessions
    # not built by session.get_spark (e.g. the round driver's own session).
    # Logged-not-silent session mutation; contract documented in
    # bigbugdata_spark.catalog's module docstring.
    from bigbugdata_spark.catalog import _set_logged

    _set_logged(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    _set_logged(spark, "spark.sql.session.timeZone", "UTC")
    # glob form: the streaming file source requires a directory or glob,
    # not a bare file path
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .parquet(f"{sf_dir}/events.parque[t]")
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_memory(result: DataFrame, mode: str) -> DataFrame:
    """Drive a streaming frame to completion into a memory sink and
    return the materialized table."""
    name = f"bb_stream_{next(_name_counter)}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(name)

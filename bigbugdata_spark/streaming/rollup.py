"""Streaming rollup maintenance (round 10) — the continuous twin of
operators/events_rollup_incr.evt_rollup_materialized: the daily
(day, event_type) rollup's partial-aggregate store maintained FROM THE
STREAM, one foreachBatch write per micro-batch, replay-idempotent.

Topology: each micro-batch's rows compress to partial rows through the
batch path's _rollup_partials builder VERBATIM (one expression tree,
the drift/freshness/mad discipline), and land as an OVERWRITE of that
batch's own `batch_id=<n>` partition directory — so a redelivered
micro-batch (failure between sink write and checkpoint commit, the
exactly-once gap foreachBatch must close itself) rewrites its own
partition instead of double-appending; the merged read SUMs partials
across all batch partitions.  With availableNow over the fixture the
merged rollup equals the batch derivation, and the SAME oracle gates
both (stream == batch is the claim).

Scale posture: per micro-batch work is one map-side-combinable groupBy
of the batch alone + a partition-scoped overwrite (no read-modify-write
of history); the store grows one small partition per batch — the
compaction story in sources/versioned.py applies to partition counts,
and readers prune nothing (they want every partition).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.operators.events_rollup_incr import (
    ROLLUP_ORACLE_SQL,
    _rollup_partials,
)
from bigbugdata_spark.registry import register
from bigbugdata_spark.streaming.core import stream_events


def write_rollup_batch(batch: DataFrame, batch_id: int, out_dir: str) -> None:
    """One micro-batch's partial rows, idempotently: OVERWRITE the
    batch's own partition directory — a replayed batch_id rewrites
    identical content (proven by test) instead of double-counting."""
    _rollup_partials(batch).write.mode("overwrite").parquet(
        f"{out_dir}/batch_id={batch_id}"
    )


def run_rollup_stream_sink(
    spark: SparkSession, sf_dir: str, out_dir: str, ckpt: str
) -> None:
    """Drive the events stream into the partial store with availableNow."""
    q = (
        stream_events(spark, sf_dir)
        .writeStream.foreachBatch(
            lambda batch, bid: write_rollup_batch(batch, bid, out_dir)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def merged_rollup(spark: SparkSession, out_dir: str) -> DataFrame:
    """SUM the partial rows across every batch partition."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_part").cast("long").alias("n_events"),
            F.sum("cents_part").cast("long").alias("sum_cents"),
        )
    )


@register(
    "evt_stream_rollup",
    # the batch query's oracle verbatim — stream == batch is the claim
    oracle=ROLLUP_ORACLE_SQL,
    tags=("streaming", "events", "storage", "agg"),
    side_effects=True,
)
def evt_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily rollup maintained from the stream: ingest the events
    fixture with availableNow, land per-batch partial partitions
    (replay-idempotent overwrites), return the merged rollup."""
    base = tempfile.mkdtemp(prefix="bigbugdata-stream-rollup-")
    try:
        out, ckpt = f"{base}/store", f"{base}/ckpt"
        run_rollup_stream_sink(spark, sf_dir, out, ckpt)
        return merged_rollup(spark, out).localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)

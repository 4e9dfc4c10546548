"""Streaming distribution-drift monitor (round 8) — the continuous twin
of operators/dq_drift.dq_distribution_drift: the categorical-mix check
runs as a complete-mode streaming aggregate so the dataset-card table
is live while the feed ingests, instead of a nightly batch audit.

Topology: the events STREAM feeds the batch query's `window_counts`
builder VERBATIM (per event_type, counts on each side of the cutoff —
a streaming-safe grouped aggregate); its `finish_drift` builder then
derives totals and the exact-integer flag over the |event_type|-row
complete-mode table (post-sink, batch-side — a streaming query cannot
nest an unpartitioned window, and the final roll-up is over a
dataset-card-sized frame anyway). One expression tree for both
queries, so the live monitor cannot drift from the batch audit; with
availableNow over the fixture the final table equals the batch
derivation, and the SAME oracle SQL gates both.

Scale posture: state is |event_type| rows of two BIGINT sums —
constant-size streaming state, no watermark needed (the aggregate never
drops keys); the production variant swaps the memory sink for a
foreachBatch overwrite of the dataset-card-sized table (complete-mode
counts REPLACE per trigger — the insert-only MERGE sinks in
streaming/sink.py are for append-shaped keys, not updating aggregates;
overwrite of a 5-row table is trivially idempotent under replay).
tests/test_round8_ops.py proves that path through the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigbugdata_spark.operators.dq_drift import (
    DRIFT_ORACLE_SQL,
    finish_drift,
    window_counts,
)
from bigbugdata_spark.registry import register
from bigbugdata_spark.streaming.core import _run_to_memory, stream_events


@register(
    "dq_stream_distribution_drift",
    # the batch query's oracle verbatim — stream == batch is the claim
    oracle=DRIFT_ORACLE_SQL,
    tags=("streaming", "dq", "events", "agg"),
    side_effects=True,
)
def dq_stream_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift monitor as a live streaming aggregate: ingest the
    events fixture with availableNow, keep per-category window counts
    as complete-mode state, and derive totals/flags from the final
    table. Gated by the identical oracle as the batch query."""
    counts = _run_to_memory(
        window_counts(stream_events(spark, sf_dir)), "complete"
    )
    return finish_drift(counts)

"""Custom stateful streaming operator via applyInPandasWithState — the
escape hatch for semantics the built-in window operators can't express
(SURVEY.md §7 phase 3). Demo operator: per-user running engagement
tracker (event count, centi-value total, last-seen timestamp) carried in
the state store across micro-batches, emitted per batch in update mode.

Why this shape: state is keyed by user_id (the shuffle key), each batch's
rows arrive as Arrow-backed pandas frames, and the operator updates O(1)
state per key — bounded state, horizontally scalable, no driver
involvement. A production sessionizer adds EventTimeTimeout to close and
emit sessions when the watermark passes; the running-total form keeps the
demo deterministic under the availableNow trigger (no timeout races), and
the event-time session semantics themselves are already covered —
exactly — by evt_session_window's merge-window formulation."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bigbugdata_spark.streaming.windows import _run_to_memory, stream_events

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("last_seen", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _track_user(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events for one user into the carried state and
    emit the updated running totals."""
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in batches:
        n += len(pdf)
        cents += int(pdf["value"].mul(100).round().astype("int64").sum())
        batch_max_us = int(pdf["ts"].astype("int64").max()) // 1000
        last_us = max(last_us, batch_max_us)
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "value_cents": [cents],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        }
    )


def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful tracker over the events stream to completion and
    return the final per-user totals (one batch under availableNow ->
    one output row per user)."""
    events = stream_events(spark, sf_dir).select("user_id", "ts", "value")
    tracked = events.groupBy("user_id").applyInPandasWithState(
        _track_user,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(tracked, "update")

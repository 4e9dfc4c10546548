"""Streaming new-user attribution (round 9) — the second custom
stateful operator (after the sessionizer/tracker in stateful.py), and
the live half of evt_growth_accounting's n_new column: WHICH day each
user first appeared is genuinely stateful (a plain streaming aggregate
can count per day, but "first ever" needs per-user memory), so the
operator carries first-seen microseconds in the state store via
applyInPandasWithState and emits a (user_id, first_seen) row whenever
the known first-seen moves EARLIER (i.e. on first encounter, and again
if an out-of-order earlier slice arrives).  The update-mode memory
sink accumulates every emission; the post-sink roll-up takes MIN per
user before counting per day, so the final table equals the batch
derivation regardless of how slices were batched or ordered — no
watermark race to reason about.

Scale posture: state is ONE BIGINT per user, keyed on user_id (the
shuffle/bucket key); each batch updates O(1) state per key with Arrow
batch transfer; emissions are at most one row per (user, batch) and
exactly one per user in the common in-order case.

Gated by a per-day first-seen oracle over the batch table, plus a
direct equality test against evt_growth_accounting's n_new column.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bigbugdata_spark.registry import register
from bigbugdata_spark.streaming.core import _run_to_memory, stream_events
from bigbugdata_spark.streaming.core import ts_us as _ts_us

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("first_seen", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("first_us", T.LongType())])


def _track_first_seen(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit (user, first_seen) when the known first-seen moves earlier."""
    known = state.get[0] if state.exists else None
    batch_min = None
    for pdf in batches:
        m = int(_ts_us(pdf["ts"]).min())
        batch_min = m if batch_min is None else min(batch_min, m)
    if batch_min is not None and (known is None or batch_min < known):
        state.update((batch_min,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "first_seen": [pd.Timestamp(batch_min, unit="us")],
            }
        )


@register(
    "evt_stream_new_users",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(strftime(CAST(ts AS DATE), '%Y-%m-%d')) AS day
            FROM events GROUP BY user_id
        )
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new
        FROM firsts GROUP BY day
    """,
    tags=("streaming", "events", "stateful"),
    side_effects=True,
)
def evt_stream_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per day, how many users appeared for the FIRST time — maintained
    live by the stateful first-seen tracker; the post-sink MIN-per-user
    roll-up makes the result independent of micro-batch slicing and
    arrival order."""
    events = stream_events(spark, sf_dir).select("user_id", "ts")
    tracked = events.groupBy("user_id").applyInPandasWithState(
        _track_first_seen,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = _run_to_memory(tracked, "update")
    firsts = emitted.groupBy("user_id").agg(
        F.min("first_seen").alias("first_seen")
    )
    return firsts.groupBy(
        F.date_format("first_seen", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_new"))

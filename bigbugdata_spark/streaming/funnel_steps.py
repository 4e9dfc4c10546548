"""Streaming step-deadline funnel (round 13) — the live twin of
operators/events_funnel_steps.evt_funnel_steps and the FIFTH custom
stateful operator (sessionizer, first-seen tracker, last-touch
attribution, multi-touch path buffer, now the funnel step clock).

Step attainment is MONOTONE: once a user's first signup is seen, the
fact "reached step 1" never retracts, and likewise for the qualifying
click/purchase — so the kernel emits one (user_id, step) row at the
moment each step is newly attained (append mode, final) and the
post-sink rollup just counts rows per step.  Unlike the MTA path
buffer there is nothing to cap: state is two BIGINT timestamps + one
boolean per user, O(1) BY CONSTRUCTION — the shape every
applyInPandasWithState operator should reach for first.

Ordering contract: identical to streaming/mta.py — emissions equal the
batch derivation for any micro-batch SLICING of a per-user
time-ordered feed (each batch walked in (ts, event_id) order, the step
clock carried across batches).  A cross-batch REORDERED feed can
change which signup/click is "first"; the repair is the batch
derivation — there is no monotone shortcut for a funnel whose step-2
deadline anchors to the step-1 time.  Since r14 the contract is
ENFORCED, not just stated (VERDICT r13 #2): state carries the
per-user high-water (ts_us, event_id) mark and a batch whose first
sorted row sits at or below it raises OutOfOrderFeedError instead of
silently mis-clocking.  Replay is safe — the state store rolls back
with the batch (see the exception's docstring in streaming/core.py).

Gated by the batch query's oracle VERBATIM (stream == batch is the
claim).

Scale posture: state is (t1_us, t2_us, done) on the user_id bucket
key; emissions are at most three rows per user ever; Arrow batch
transfer; the post-sink rollup is a single-row aggregate.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bigbugdata_spark.operators.events_funnel_steps import (
    _FUNNEL_STEPS_ORACLE_SQL,
    STEP_WINDOW_US,
)
from bigbugdata_spark.registry import register
from bigbugdata_spark.streaming.core import (
    OutOfOrderFeedError,
    _run_to_memory,
    stream_events,
)
from bigbugdata_spark.streaming.core import ts_us as _ts_us

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("step", T.IntegerType()),
    ]
)

#: the funnel clock: first-signup us, qualifying-click us (both -1 =
#: not reached), purchase-attained flag — O(1) per user, no cap needed
#: — plus the high-water (ts_us, event_id) mark of the last event
#: walked (-1/-1 = none yet), the out-of-order detector (r14)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("t1_us", T.LongType()),
        T.StructField("t2_us", T.LongType()),
        T.StructField("done", T.BooleanType()),
        T.StructField("hw_us", T.LongType()),
        T.StructField("hw_eid", T.LongType()),
    ]
)

_UNSET = -1


def _advance_funnel(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Walk the user's rows in (ts, event_id) order, advancing the
    step clock; emit (user_id, step) once per newly-attained step."""
    t1, t2, done, hw_us, hw_eid = (
        state.get if state.exists else (_UNSET, _UNSET, False, -1, -1)
    )
    steps: list[int] = []
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.assign(us=_ts_us(pdf["ts"])).sort_values(["us", "event_id"])
        # out-of-order detector: the batch is sorted, so the whole
        # batch sits above the mark iff its FIRST row does (the mark
        # rolls back with the state store on replay — see
        # OutOfOrderFeedError's docstring)
        first = pdf.iloc[0]
        lo = (int(first["us"]), int(first["event_id"]))
        if lo <= (hw_us, hw_eid):
            raise OutOfOrderFeedError("funnel", key, lo, (hw_us, hw_eid))
        # and WITHIN the batch: event_id is unique in the feed
        # contract, so an equal (us, event_id) pair is a duplicate
        # redelivery the cross-batch mark can't see (r14 self-review)
        dup = pdf.duplicated(subset=["us", "event_id"])
        if dup.any():
            d = pdf[dup].iloc[0]
            raise OutOfOrderFeedError(
                "funnel",
                key,
                (int(d["us"]), int(d["event_id"])),
                (hw_us, hw_eid),
                reason="duplicated within one micro-batch",
            )
        last = pdf.iloc[-1]
        hw_us, hw_eid = int(last["us"]), int(last["event_id"])
        for r in pdf.itertuples(index=False):
            us = int(r.us)
            if t1 == _UNSET:
                if r.event_type == "signup":
                    t1 = us
                    steps.append(1)
            elif t2 == _UNSET:
                if (
                    r.event_type == "click"
                    and t1 < us <= t1 + STEP_WINDOW_US
                ):
                    t2 = us
                    steps.append(2)
            elif not done:
                if (
                    r.event_type == "purchase"
                    and t2 < us <= t2 + STEP_WINDOW_US
                ):
                    done = True
                    steps.append(3)
    state.update((t1, t2, done, hw_us, hw_eid))
    if steps:
        yield pd.DataFrame({"user_id": [key[0]] * len(steps), "step": steps})


@register(
    "evt_stream_funnel_steps",
    # the batch query's oracle verbatim — stream == batch is the claim
    oracle=_FUNNEL_STEPS_ORACLE_SQL,
    tags=("streaming", "events", "stateful"),
    side_effects=True,
)
def evt_stream_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The signup -> click(+6h) -> purchase(+6h) funnel maintained
    live: one append-final (user, step) emission per attained step,
    single-row conversion rollup post-sink — equals the batch
    derivation for any slicing of an in-order feed."""
    ev = stream_events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    attained = ev.groupBy("user_id").applyInPandasWithState(
        _advance_funnel,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = _run_to_memory(attained, "append")
    # coalesce(0): a feed with no signups emits nothing, and SUM over
    # the empty memory table is NULL while the oracle counts zeros
    # (r13 review finding)
    counts = emitted.agg(
        F.coalesce(F.sum(F.when(F.col("step") == 1, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_signup"),
        F.coalesce(F.sum(F.when(F.col("step") == 2, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_click_6h"),
        F.coalesce(F.sum(F.when(F.col("step") == 3, 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("n_purchase_6h"),
    )
    return counts.select(
        "n_signup",
        "n_click_6h",
        "n_purchase_6h",
        F.expr("n_click_6h * 1000 div greatest(n_signup, 1)")
        .cast("long")
        .alias("click_conv_pm"),
        F.expr("n_purchase_6h * 1000 div greatest(n_click_6h, 1)")
        .cast("long")
        .alias("purchase_conv_pm"),
    )

"""Streaming multi-touch (linear) attribution (round 12) — the live
twin of operators/events_mta.evt_multi_touch_attribution and the FOURTH
custom stateful operator (sessionizer, first-seen tracker, last-touch
attribution, now the path buffer): linear credit needs the purchase's
whole conversion PATH at emission time, so per-user state carries the
ordered touch-type path since the user's previous purchase —
\\x1f-joined in one string column.

The buffer is BOUNDED (r13, VERDICT r12 #3): the path holds at most
MTA_PATH_CAP touches and degrades to last-MTA_PATH_CAP-touch credit
beyond that — a purchase-free user (exactly the behavior
evt_bot_regularity flags) grows state to the cap and stops, instead of
without bound.  The cap (512) sits an order of magnitude above any
organic inter-purchase run in the fixtures (max observed 45 at sf0.1),
so stream == batch holds verbatim on real paths; only adversarial
volumes degrade, deterministically (tests pin both sides of the cap).

On each purchase the kernel emits the purchase's credit rows — one per
path touch (cents div k, remainder to the last touch) or one 'organic'
row for an empty path — and RESETS the path.  Emissions are final
(append mode); the post-sink rollup is the same five-type aggregate as
the batch query.

Ordering contract: identical to streaming/attrib.py — the emitted rows
equal the batch derivation for any micro-batch SLICING of a per-user
time-ordered feed (each batch walked in (ts, event_id) order, path
carried across batches).  Cross-batch reordering changes what "the
path" meant at emission; the repair is the batch derivation.  Unlike
last-touch there is no monotone shortcut for a reordered path — an
out-of-order touch belongs in the MIDDLE of a path — so the contract
stays prefix-only, and since r14 it is ENFORCED, not just stated
(VERDICT r13 #2, the scd_sink.py pattern brought inside the kernel):
state carries the per-user high-water (ts_us, event_id) mark, and a
batch whose first sorted row sits at or below it raises
OutOfOrderFeedError instead of silently mis-crediting.  Replay is
safe — the state store rolls back with the batch (see the exception's
docstring in streaming/core.py).

Gated by the batch query's oracle VERBATIM (stream == batch is the
claim).

Scale posture: state is one string + its length per user on the
user_id bucket key; emissions are (purchases x path length)-sized;
Arrow batch transfer; post-sink rollup five keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bigbugdata_spark.functions.fragments import cents_col
from bigbugdata_spark.operators.events_mta import MTA_ORACLE_SQL
from bigbugdata_spark.registry import register
from bigbugdata_spark.streaming.core import (
    OutOfOrderFeedError,
    _run_to_memory,
    stream_events,
)
from bigbugdata_spark.streaming.core import ts_us as _ts_us

_SEP = "\x1f"

#: per-user path-buffer bound: last-K-touch degrade beyond this many
#: touches since the previous purchase.  Far above organic runs (the
#: sf0.1 fixture maxes at 45), so the under-cap path — byte-identical
#: to the batch derivation — is the one real users take; state is
#: bounded at ~cap x touch-type-width bytes per user either way.
MTA_PATH_CAP = 512

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("touch_type", T.StringType()),
        T.StructField("credit", T.LongType()),
    ]
)

#: the ordered touch-type path since the last purchase, \x1f-joined
#: ('' = empty path), plus its length (avoids re-splitting to count),
#: plus the high-water (ts_us, event_id) mark of the last event walked
#: (-1/-1 = none yet) — the out-of-order detector (VERDICT r13 #2)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("path_len", T.LongType()),
        T.StructField("hw_us", T.LongType()),
        T.StructField("hw_eid", T.LongType()),
    ]
)


def _credit_path(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Walk the user's rows in (ts, event_id) order, carrying the path
    since the last purchase; emit the credit rows per purchase."""
    from collections import deque

    if state.exists:
        path_s, _n, hw_us, hw_eid = state.get
        prior = path_s.split(_SEP) if path_s else []
    else:
        prior, hw_us, hw_eid = [], -1, -1
    # maxlen enforces the last-K-touch degrade as appends arrive
    path: deque[str] = deque(prior, maxlen=MTA_PATH_CAP)
    out_type: list[str] = []
    out_credit: list[int] = []
    # concat-then-sort-once across Arrow chunks (the attrib.py lesson:
    # per-chunk sorting is not a total order over the group)
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.assign(ts_us=_ts_us(pdf["ts"])).sort_values(
            ["ts_us", "event_id"]
        )
        # out-of-order detector: the batch is sorted, so the whole
        # batch sits above the mark iff its FIRST row does (the mark
        # rolls back with the state store on replay — see
        # OutOfOrderFeedError's docstring)
        first = pdf.iloc[0]
        lo = (int(first["ts_us"]), int(first["event_id"]))
        if lo <= (hw_us, hw_eid):
            raise OutOfOrderFeedError("mta", key, lo, (hw_us, hw_eid))
        # and WITHIN the batch: event_id is unique in the feed
        # contract, so an equal (ts_us, event_id) pair is a duplicate
        # redelivery the cross-batch mark can't see (r14 self-review)
        dup = pdf.duplicated(subset=["ts_us", "event_id"])
        if dup.any():
            d = pdf[dup].iloc[0]
            raise OutOfOrderFeedError(
                "mta",
                key,
                (int(d["ts_us"]), int(d["event_id"])),
                (hw_us, hw_eid),
                reason="duplicated within one micro-batch",
            )
        last = pdf.iloc[-1]
        hw_us, hw_eid = int(last["ts_us"]), int(last["event_id"])
        for r in pdf.itertuples(index=False):
            if r.event_type == "purchase":
                cents = int(r.cents)
                k = len(path)
                if k == 0:
                    out_type.append("organic")
                    out_credit.append(cents)
                else:
                    # truncate-toward-zero div/rem (ADVICE r12: Python
                    # divmod FLOORS, but Spark div/% and DuckDB /// %
                    # truncate — equal only for cents >= 0, and a
                    # refund-style negative value must not break
                    # stream == batch)
                    base = cents // k if cents >= 0 else -((-cents) // k)
                    rem = cents - base * k
                    for i, t in enumerate(path):
                        out_type.append(t)
                        out_credit.append(base + (rem if i == k - 1 else 0))
                path.clear()
            else:
                path.append(str(r.event_type))
    state.update((_SEP.join(path), len(path), hw_us, hw_eid))
    if out_type:
        yield pd.DataFrame({"touch_type": out_type, "credit": out_credit})


@register(
    "evt_stream_multi_touch",
    # the batch query's oracle verbatim — stream == batch is the claim
    oracle=MTA_ORACLE_SQL,
    tags=("streaming", "events", "stateful"),
    side_effects=True,
)
def evt_stream_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution maintained live: per-user path
    buffer in the state store, credit rows emitted at each purchase
    (append mode, final), five-type rollup post-sink — equals the batch
    derivation for any slicing of an in-order feed."""
    ev = stream_events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type", cents_col().alias("cents")
    )
    credited = ev.groupBy("user_id").applyInPandasWithState(
        _credit_path,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = _run_to_memory(credited, "append")
    return emitted.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_credits"),
        F.sum("credit").cast("long").alias("credited_cents"),
    )

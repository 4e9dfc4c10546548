"""Streaming user-lifecycle features (round 8) — the feature store
maintained LIVE: the streaming-safe subset of evt_user_features
(operators/events_features.py) as a complete-mode aggregate on the
events stream, so the user dimension is current while the feed
ingests instead of rebuilt nightly.

Streaming-safe means min/max/count/conditional-sum only: the batch
table's COUNT(DISTINCT ...) columns (type diversity, active days) are
not expressible as streaming aggregate state without a two-level
aggregation Structured Streaming disallows — the honest split is this
lifecycle subset live + the full feature table batch, both from ONE
shared builder so the overlapping columns cannot drift.

With availableNow over the fixture the final complete-mode table
equals the batch derivation, and the oracle (the matching projection
of the batch query's SQL) gates both. Scale posture: state is one row
of six scalars per user — the same user-grain the batch table
materializes; the production sink is the bucketed MERGE
(streaming/sink.py) keyed on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL, TS_FMT_DUCK
from bigbugdata_spark.registry import register
from bigbugdata_spark.streaming.core import _run_to_memory, stream_events


def lifecycle_features(ev: DataFrame) -> DataFrame:
    """The streaming-safe feature subset over any events frame — the
    aggregate expressions come verbatim from the batch feature table
    (events_features.lifecycle_agg_cols), so the overlap cannot
    drift."""
    from bigbugdata_spark.operators.events_features import lifecycle_agg_cols

    return ev.groupBy("user_id").agg(*lifecycle_agg_cols())


@register(
    "evt_stream_user_lifecycle",
    oracle=f"""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               strftime(MIN(ts), '{TS_FMT_DUCK}') AS first_ts,
               strftime(MAX(ts), '{TS_FMT_DUCK}') AS last_ts,
               epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS tenure_us,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN {CENTS_SQL} ELSE 0 END) AS BIGINT)
                   AS purchase_cents
        FROM events GROUP BY user_id
    """,
    tags=("streaming", "events", "features", "agg"),
    side_effects=True,
)
def evt_stream_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The live user dimension: per-user lifecycle features maintained
    as complete-mode streaming state; availableNow over the fixture
    makes the final table equal the batch derivation the oracle
    re-computes."""
    return _run_to_memory(
        lifecycle_features(stream_events(spark, sf_dir)), "complete"
    )


def batch_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin (same shared builder) for the stream==batch test."""
    return lifecycle_features(table(spark, sf_dir, "events"))

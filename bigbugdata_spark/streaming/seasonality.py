"""Streaming seasonality monitor (round 9) — the continuous twin of
operators/events_season.evt_seasonality_profile: the hour x ISO-dow
activity heatmap maintained as complete-mode streaming state, so the
capacity-planning card is live while the feed ingests.

Topology follows the drift/freshness pattern: the events STREAM feeds
the batch query's `season_cells` builder VERBATIM (one streaming-safe
grouped aggregate on a 168-cell key space), and `finish_seasonality`
derives shares and the hot flags over the final complete-mode table
post-sink.  One expression tree for both, so the live heatmap cannot
drift from the batch audit; with availableNow over the fixture the
final table equals the batch derivation, and the SAME oracle gates
both.

Scale posture: state is at most 168 rows of one BIGINT each — constant
and tiny; no watermark (the aggregate never drops keys); production
swaps the memory sink for a foreachBatch overwrite of the heatmap-
sized table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigbugdata_spark.operators.events_season import (
    SEASONALITY_ORACLE_SQL,
    finish_seasonality,
    season_cells,
)
from bigbugdata_spark.registry import register
from bigbugdata_spark.streaming.core import _run_to_memory, stream_events


@register(
    "evt_stream_seasonality",
    # the batch query's oracle verbatim — stream == batch is the claim
    oracle=SEASONALITY_ORACLE_SQL,
    tags=("streaming", "events", "agg"),
    side_effects=True,
)
def evt_stream_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The seasonality heatmap live: ingest the events fixture with
    availableNow, hold per-(dow, hod) counts as complete-mode state,
    derive shares/hot-flags through the shared batch tail."""
    cells = _run_to_memory(
        season_cells(stream_events(spark, sf_dir)), "complete"
    )
    return finish_seasonality(cells)

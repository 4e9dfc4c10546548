"""Incrementally-maintained daily rollup (round 10) — dedup's
persisted-index ingest story applied to AGGREGATES: the
(day, event_type) rollup every dashboard reads is served from a
PERSISTED partial-aggregate store, built once per source content and
APPENDED per ingested batch, so the nightly job merges partials
instead of rescanning the event history.  This is incremental view
maintenance for the commutative-monoid case (COUNT/SUM partials merge
by addition), the standard lakehouse materialized-rollup pattern.

Store layout: evt_rollup_<fp> (day, event_type, n_part, cents_part)
bucketed by day under the per-user index root (dedup_incr_core's
attach/sweep/fingerprint machinery, fingerprinting events.parquet).
Rows are PARTIALS — appends never rewrite existing rows, readers SUM
by (day, event_type); the gram_df_<fp> delta-row discipline exactly.

No analog in the reference (SURVEY §2.1); storage/events extension
surface.

Determinism: COUNT and exact-cents SUM partials; merge order is
irrelevant (integer addition).

Scale posture: the build is one map-side-combinable groupBy over
events (paid once per content); a warm serve touches ONLY the
partial store — days x types x batches rows, orders of magnitude
below the event count (plan-tested: no events scan on a warm run).
At 100 TB the append path is the per-batch rollup of the batch alone;
compaction of accumulated partial files is sources/versioned.py's
story, unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL, cents_col
from bigbugdata_spark.operators.dedup_incr_core import (
    INDEX_BUCKETS,
    _corpus_fingerprint,
    append_bucketed,
    begin_append_intent,
    commit_append_intent,
    attach_index_tables,
    ensure_index_root,
    index_path,
    remove_incomplete_locations,
    sweep_stale_generations,
)
from bigbugdata_spark.registry import register

_PREFIX = "evt_rollup_"


def _rollup_partials(ev: DataFrame) -> DataFrame:
    """(day, event_type, n_part, cents_part) partial-aggregate rows for
    any slice of events — the build AND the per-batch append both emit
    exactly this shape."""
    return (
        ev.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
            cents_col().alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_part"),
            F.sum("cents").alias("cents_part"),
        )
    )


def rollup_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted partial store for sf_dir's events, building it from
    the full table if no completed generation exists (the gram_index
    adopt-or-build protocol, same sweep scoping)."""
    fp = _corpus_fingerprint(sf_dir, "events.parquet")
    name = f"{_PREFIX}{fp}"
    if not spark.catalog.tableExists(name):
        from bigbugdata_spark.sources.bucketed import write_bucketed

        ensure_index_root()
        sweep_stale_generations(spark, (_PREFIX,), fp)
        if attach_index_tables(
            spark,
            (
                (
                    name,
                    "day STRING, event_type STRING, "
                    "n_part BIGINT, cents_part BIGINT",
                    "day",
                ),
            ),
        ):
            return spark.table(name)
        remove_incomplete_locations((name,))
        write_bucketed(
            _rollup_partials(table(spark, sf_dir, "events")),
            name,
            "day",
            n_buckets=INDEX_BUCKETS,
            path=index_path(name),
        )
    return spark.table(name)


def append_batch_to_rollup(
    spark: SparkSession, batch_ev: DataFrame, fp: str
) -> None:
    """Maintenance: an ingested batch's partial rows APPEND into the
    same bucket layout; no existing row is rewritten (append==rebuild
    proven by the lifecycle test).  Single table, but a saveAsTable
    append's JOB COMMIT moves task files into place non-atomically —
    the intent sentinel (r17) turns a mid-commit writer death into a
    cold rebuild instead of a partially-visible batch."""
    name = f"{_PREFIX}{fp}"
    intent = begin_append_intent((name,))
    append_bucketed(_rollup_partials(batch_ev), name, "day")
    commit_append_intent(intent)


#: the rollup ground truth — shared verbatim with the streaming
#: maintenance path (streaming/rollup.py), whose claim is stream==batch
ROLLUP_ORACLE_SQL = f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM({CENTS_SQL}) AS BIGINT) AS sum_cents
    FROM events GROUP BY day, event_type
"""


@register(
    "evt_rollup_materialized",
    oracle=ROLLUP_ORACLE_SQL,
    tags=("events", "storage", "agg"),
    side_effects=True,
)
def evt_rollup_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, event_type, n_events, sum_cents) served by merging the
    persisted partial store — a warm run never rescans events (plan
    test); the oracle recomputes the identical rollup from the raw
    table, so staleness or a bad merge goes hash-red.  Registered read
    query that materializes storage on first run (the
    dedup_incremental precedent)."""
    store = rollup_store(spark, sf_dir)
    return store.groupBy("day", "event_type").agg(
        F.sum("n_part").cast("long").alias("n_events"),
        F.sum("cents_part").cast("long").alias("sum_cents"),
    )

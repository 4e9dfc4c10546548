"""Stream-STATIC enrichment join — the most common production streaming
join (every event stream is enriched against dimension tables before
anything else happens to it), completing the streaming join surface
next to the stream-stream attribution join (joins.py).

Semantics Spark gives a stream-static inner join: the STATIC side is
re-resolved every micro-batch (a dimension update between batches is
picked up; no state is kept for the static side), the stream side needs
no watermark for an inner join, and each micro-batch's output is just
batch-join(micro-batch, dim). With availableNow over the fixture the
union of micro-batch outputs is row-identical to the batch join — which
is exactly what the registered oracle checks, and what
tests/test_streaming.py pins through the engine itself.

Scale posture: the dimension is broadcast per batch when small (the
planner sees its size each time); a 100 TB-era dimension instead lives
key-bucketed (sources/bucketed.py) so each micro-batch aligns to the
bucket layout and the dim never shuffles — the same posture as the
bucketed upsert sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL
from bigbugdata_spark.registry import register
from bigbugdata_spark.streaming.core import _run_to_memory, stream_events


def _enriched_totals(ev: DataFrame, cust: DataFrame) -> DataFrame:
    """Shared plan: enrich events with the customer's market segment,
    then aggregate exact value cents per (segment, event_type)."""
    from bigbugdata_spark.functions.fragments import cents_col

    enriched = ev.join(
        cust.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("mktsegment"),
        ),
        "user_id",
    )
    return (
        enriched.select("mktsegment", "event_type", cents_col().alias("cents"))
        .groupBy("mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )
    )


@register(
    "evt_stream_enriched_totals",
    oracle=f"""
        SELECT c.c_mktsegment AS mktsegment,
               e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM({CENTS_SQL}) AS BIGINT) AS value_cents
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY mktsegment, e.event_type
    """,
    tags=("streaming", "events", "join", "agg"),
    side_effects=True,
)
def evt_stream_enriched_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-enriched streaming totals: the events STREAM inner-joins
    the static customer table per micro-batch, then a complete-mode
    aggregate rolls exact value cents up per (market segment, event
    type) — the canonical enrich-then-aggregate topology of a metrics
    pipeline. availableNow ingests the whole fixture, so the final
    complete-mode table equals the batch join+aggregate, which the
    DuckDB oracle re-derives independently (hash-exact: counts and
    integer cents only)."""
    ev = stream_events(spark, sf_dir)
    cust = table(spark, sf_dir, "customer")
    return _run_to_memory(_enriched_totals(ev, cust), "complete")


def batch_enriched_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch twin (same shared plan) for the stream==batch test."""
    return _enriched_totals(
        table(spark, sf_dir, "events"), table(spark, sf_dir, "customer")
    )

"""Sequence-completeness audit (round 10) — the ingest-integrity check
the dq family still lacked: for each id-bearing feed, did every row of
the upstream sequence actually land, and did any land twice?  One card
row per feed: row count, distinct ids, observed id range, the range's
span, and the two defect counters (missing = span - distinct ids,
duplicated = rows - distinct ids).  This is the first question asked
when a backfill or a replayed ingest is suspected of dropping or
double-delivering data.

On this synthetic fixture both feeds are dense and duplicate-free, so
both cards read all-clear (0 missing / 0 dupes) — the correct answer
for healthy data; the defect counters themselves are exercised by a
planted-gap/planted-replay corpus in tests/test_round10_ops.py, the
fires-when-it-should half of the contract.

No analog in the reference (SURVEY §2.1); dq extension surface.

Determinism: counts, distinct counts, min/max — all exact integers.

Scale posture: one pass per feed — COUNT/MIN/MAX are map-side
partials, COUNT(DISTINCT id) is one hash-agg shuffle keyed on the id
(Spark expands it to a two-stage partial distinct); output is
feeds-sized.  At 100 TB over a date-partitioned lake the same audit
runs per partition and the cards roll up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

# (feed, table, id column)
SEQ_FEEDS = (
    ("events", "events", "event_id"),
    ("orders", "orders", "o_orderkey"),
)


def _feed_sql(feed: str, tbl: str, col: str) -> str:
    return f"""
    SELECT '{feed}' AS feed,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_ids,
           CAST(MIN({col}) AS BIGINT) AS min_id,
           CAST(MAX({col}) AS BIGINT) AS max_id,
           CAST(MAX({col}) - MIN({col}) + 1 AS BIGINT) AS span,
           CAST(MAX({col}) - MIN({col}) + 1
                - COUNT(DISTINCT {col}) AS BIGINT) AS n_missing,
           CAST(COUNT(*) - COUNT(DISTINCT {col}) AS BIGINT) AS n_dupes
    FROM {tbl}
    """


_SEQ_SQL = "\nUNION ALL\n".join(
    _feed_sql(feed, tbl, col) for feed, tbl, col in SEQ_FEEDS
)


@register(
    "dq_id_completeness",
    oracle=_SEQ_SQL,
    tags=("dq", "agg"),
)
def dq_id_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per id-bearing feed: rows, distinct ids, observed id range and
    span, missing-id count (span - distinct) and duplicate-row count
    (rows - distinct) — the replay/backfill integrity card."""
    parts = []
    for feed, tbl, col in SEQ_FEEDS:
        t = table(spark, sf_dir, tbl).select(F.col(col).alias("id"))
        agg = t.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("id").alias("n_ids"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        span = F.col("max_id") - F.col("min_id") + 1
        parts.append(
            agg.select(
                F.lit(feed).alias("feed"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_ids").cast("long").alias("n_ids"),
                F.col("min_id").cast("long").alias("min_id"),
                F.col("max_id").cast("long").alias("max_id"),
                span.cast("long").alias("span"),
                (span - F.col("n_ids")).cast("long").alias("n_missing"),
                (F.col("n_rows") - F.col("n_ids"))
                .cast("long")
                .alias("n_dupes"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

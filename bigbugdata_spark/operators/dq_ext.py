"""Data-quality monitoring extensions (round 7) — the TIME-SERIES side
of the dq family: operators/dq.py audits a batch's content (referential
integrity, constraint rules, split leakage); this module audits the
PIPELINE's behavior over time, starting with daily-volume anomaly
detection — the "did ingest silently halve on Tuesday" check every
production feed monitors. No analog in the reference (SURVEY §2.1).

Scale posture: the daily rollup is one map-side-combinable aggregate on
the date key (at 100 TB the date-partitioned layout makes it a
partition-metadata-sized job); the global moments reduce 31 day-rows to
one broadcast row. Output is days-sized — a dataset-card table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.caching import pin
from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

Z_THRESHOLD = 2.0


@register(
    "dq_volume_anomaly",
    oracle=f"""
        WITH daily AS (
            SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY day
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS c,
                   CAST(SUM(n_events) AS BIGINT) AS s,
                   CAST(SUM(n_events * n_events) AS BIGINT) AS ssq
            FROM daily
        )
        SELECT day, n_events,
               CASE WHEN (CAST(ssq AS DOUBLE) / c)
                         - (CAST(s AS DOUBLE) / c) * (CAST(s AS DOUBLE) / c) > 0
                    THEN (n_events - CAST(s AS DOUBLE) / c)
                         / sqrt((CAST(ssq AS DOUBLE) / c)
                                - (CAST(s AS DOUBLE) / c) * (CAST(s AS DOUBLE) / c))
               END AS z,
               CAST(COALESCE(abs(
                   CASE WHEN (CAST(ssq AS DOUBLE) / c)
                             - (CAST(s AS DOUBLE) / c) * (CAST(s AS DOUBLE) / c) > 0
                        THEN (n_events - CAST(s AS DOUBLE) / c)
                             / sqrt((CAST(ssq AS DOUBLE) / c)
                                    - (CAST(s AS DOUBLE) / c) * (CAST(s AS DOUBLE) / c))
                   END) > {Z_THRESHOLD}, FALSE) AS INT) AS is_anomaly
        FROM daily CROSS JOIN mom
    """,
    tags=("dq", "events", "agg"),
)
def dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily ingest-volume anomaly flags: per calendar day, the event
    count, its z-score against all days' population moments, and an
    |z| > 2 anomaly flag. A feed that silently halves (upstream outage)
    or doubles (replay/duplication) trips the flag without anyone
    defining per-feed thresholds.

    Determinism discipline: the moments are EXACT integer sums (count,
    sum, sum-of-squares — all BIGINT), so mean and variance are fixed
    fp64 expressions over exact integers, identical in both engines;
    the population-variance form (ssq/c - mean^2) is written out
    literally on both sides rather than relying on either engine's
    stddev aggregate (whose accumulation order is engine-internal). A
    zero/negative variance (fp guard) yields NULL z and a 0 flag."""
    # pinned: the days-sized rollup feeds both the moments aggregate and
    # the final join — without it each consumer re-scans events
    daily = pin(
        table(spark, sf_dir, "events")
        .select(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    mom = daily.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ssq"),
    )
    mean = F.col("s").cast("double") / F.col("c")
    var = F.col("ssq").cast("double") / F.col("c") - mean * mean
    z = F.when(var > 0, (F.col("n_events") - mean) / F.sqrt(var))
    return daily.crossJoin(F.broadcast(mom)).select(
        "day",
        "n_events",
        z.alias("z"),
        F.coalesce(F.abs(z) > Z_THRESHOLD, F.lit(False)).cast("int").alias(
            "is_anomaly"
        ),
    )


# (table, primary-key column) — every base table's uniqueness contract
PK_COLUMNS = (
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
)

_PK_SQL = "\nUNION ALL\n".join(
    f"""
    SELECT '{tbl}' AS tbl,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {pk}) AS BIGINT) AS n_distinct,
           CAST(COUNT({pk}) - COUNT(DISTINCT {pk}) AS BIGINT) AS n_extra_rows,
           CAST(SUM(CASE WHEN {pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_keys
    FROM {tbl}
    """
    for tbl, pk in PK_COLUMNS
)


@register(
    "dq_pk_uniqueness",
    oracle=_PK_SQL,
    tags=("dq", "agg"),
)
def dq_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit — the third leg of the canonical
    ingest-gate trio (referential integrity, constraint rules, PK
    uniqueness): per base table, row count, distinct key count, how many
    EXTRA rows duplicate keys account for (counted over NON-NULL keys:
    COUNT(pk) - COUNT(DISTINCT pk), so a table of N null keys and no
    true duplicates reports 0 — advisor r7 fix), and how many NULL keys
    exist (a NULL key is its own defect class, not a duplicate).
    A replayed ingest or a bad merge shows up here before any downstream
    join silently fans out.

    Plan: ONE conditional aggregate per table (count + distinct-count +
    null-count in a single scan with map-side partials) — the same
    cheapest-audit shape as dq_constraint_violations; output is
    table-count-sized."""
    frames = []
    for tbl, pk in PK_COLUMNS:
        t = table(spark, sf_dir, tbl)
        frames.append(
            t.agg(
                F.lit(tbl).alias("tbl"),
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(pk).alias("n_distinct"),
                (F.count(pk) - F.countDistinct(pk)).alias("n_extra_rows"),
                F.sum(F.col(pk).isNull().cast("long")).alias("n_null_keys"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out

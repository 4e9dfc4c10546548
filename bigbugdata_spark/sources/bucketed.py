"""Bucketed table layout — shuffle-free co-located joins at rest.

The 100 TB join strategy the operator docstrings keep referring to: when
two large tables join repeatedly on one key (fact x fact, fact x rollup),
write both bucketed AND sorted by that key. Spark's scan then reports a
compatible HashPartitioning, the planner drops both Exchange operators,
and the sort-merge join runs entirely map-side — the shuffle is paid ONCE
at write time instead of on every query. (The reference has no storage
layer at all — its 'layout' is a python dict, SURVEY §2.1.)

Bucket-count guidance: buckets x target-file-size ~ table size; keep
buckets a multiple of executor cores so every core owns whole buckets.
tests/test_bucketing.py locks the zero-exchange plan in."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, name: str, key: str, n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist as a bucketed+sorted catalog table (parquet).  With
    `path` the table is EXTERNAL at that location — callers that must
    not depend on the session's warehouse dir (the persisted dedup
    indexes, which also run under the round driver's own session
    config) pass an explicit /tmp location so no spark-warehouse
    directory ever appears in the working tree."""
    w = (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def bucketed(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)

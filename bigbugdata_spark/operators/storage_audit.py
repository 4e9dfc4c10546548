"""Partitioned-lake accounting under the driver's hash gate (round 8,
VERDICT r7 #5) — the partitioned/clustered layout (sources/partitioned.py)
was proven only by layout tests; this registers a query that WRITES the
date-partitioned, row-group-clustered events lake and reads the
accounting back THROUGH the layout, with a DuckDB twin over the original
events table. A lost partition, a day routed to the wrong directory, a
partition column corrupted by the salt repartition — any of it shifts
the per-day counts and fails the value-hash compare. The file-count
budget itself is not SQL-expressible, so it is enforced IN the query
(a violated budget raises, which the driver records as an errored row)
and measured precisely by tests/test_storage.py.

No analog in the reference (SURVEY §2.1 — its output is three CSVs);
storage extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL, cents_col
from bigbugdata_spark.registry import register

_FILES_PER_PARTITION = 2


@register(
    "evt_partitioned_lake_accounting",
    oracle=f"""
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(SUM({CENTS_SQL}) AS BIGINT) AS total_cents
        FROM events GROUP BY day
    """,
    tags=("events", "storage", "agg"),
    side_effects=True,
)
def evt_partitioned_lake_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the events table as a date-partitioned, user-clustered
    parquet lake (file budget {budget}/partition, sources/partitioned.py)
    and report per-partition row/user/value accounting READ BACK through
    the layout — the dataset-card table a lake publishes per partition,
    and the hash gate for the storage path: the DuckDB twin aggregates
    the ORIGINAL table, so the write+read round trip must preserve every
    row into the correct day partition.

    The non-SQL half of the layout contract — the file budget — is
    asserted in-query: any partition exceeding {budget} files raises,
    turning a layout regression into a red driver row.

    Scale: the write is partitioned.py's single (day, salt) shuffle;
    the read-back aggregate is partition-parallel with the day key
    taken from directory metadata (no ts re-parse); scratch tree is
    deleted after an eager checkpoint, as in corpus_version_diff."""
    import os
    import shutil
    import tempfile

    from bigbugdata_spark.sources.partitioned import (
        DAY_COL,
        write_partitioned,
    )

    base = tempfile.mkdtemp(prefix="bigbugdata-lake-")
    try:
        lake = f"{base}/events_lake"
        write_partitioned(
            table(spark, sf_dir, "events"),
            lake,
            files_per_partition=_FILES_PER_PARTITION,
            cluster_by=("user_id",),
        )
        for d in os.listdir(lake):
            if not d.startswith(f"{DAY_COL}="):
                continue
            n = sum(
                1 for f in os.listdir(os.path.join(lake, d))
                if f.endswith(".parquet")
            )
            if n > _FILES_PER_PARTITION:
                raise RuntimeError(
                    f"file budget violated: {d} holds {n} files "
                    f"(budget {_FILES_PER_PARTITION})"
                )
        out = (
            spark.read.parquet(lake)
            .groupBy(F.date_format(DAY_COL, "yyyy-MM-dd").alias("day"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("user_id").alias("n_users"),
                F.sum(cents_col()).alias("total_cents"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


evt_partitioned_lake_accounting.__doc__ = (
    evt_partitioned_lake_accounting.__doc__.format(budget=_FILES_PER_PARTITION)
)

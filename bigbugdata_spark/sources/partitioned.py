"""Size-targeted partitioned parquet layout + small-file compaction.

The OTHER half of the 100 TB storage story next to `bucketed.py`: a
date-partitioned event/fact table that is appended to continuously (one
micro-batch or ingest job at a time) degenerates into thousands of tiny
parquet files per partition — every downstream scan then pays file-open
and footer-read costs that dwarf the data, and the driver chokes listing
them. (The reference has no storage layer at all; its output is three
CSV files, SURVEY §2.1 — this module exists for the extension tables.)

Two primitives:

* `write_partitioned(df, path, ...)` — write partitioned by a derived
  day column with a FILE-COUNT BUDGET PER PARTITION, enforced by
  repartitioning on (partition cols + a deterministic row-hash salt)
  before the write: a day's rows occupy at most `files_per_partition`
  salt groups, so at most that many tasks (hence files) per day —
  regardless of upstream parallelism, which is the actual source of
  the small-files problem. The budget is an upper bound: AQE may
  coalesce salt groups below it when they are tiny, which is strictly
  fewer/larger files — the desired direction. Hash-salting (not
  `repartition(n)` round-robin) keeps the write deterministic under
  retries and AQE re-plans.
* `compact_partitions(spark, path, ...)` — the maintenance pass: read
  the table back, coalesce each partition's splinter files down to the
  target count, and rewrite atomically-per-partition via dynamic
  partition overwrite (only partitions actually read are replaced;
  untouched partitions keep their files — the idempotent, re-runnable
  form of OPTIMIZE on a plain parquet lake).

Scale posture: both paths are one shuffle each, keyed by the physical
layout; file counts are budgeted explicitly (files x target-file-size ~
partition size) instead of inherited from whatever parallelism the
upstream job happened to have — which is the actual cause of the
small-files problem. Partition pruning on the derived day column is
asserted by tests/test_plans.py::test_partitioned_layout_prunes_partitions
for the same layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAY_COL = "event_date"


def with_day(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Add the partition column: calendar day of the event timestamp."""
    return df.withColumn(DAY_COL, F.to_date(F.col(ts_col)))


def write_partitioned(
    df: DataFrame,
    path: str,
    files_per_partition: int = 1,
    ts_col: str = "ts",
    salt_col: str = "event_id",
    mode: str = "overwrite",
    cluster_by: tuple[str, ...] = (),
    writer_options: dict | None = None,
) -> None:
    """Write `df` date-partitioned with a budgeted file count.

    The repartition key is (day, pmod(hash(salt_col), files)): at most
    `files_per_partition` distinct keys exist per day, so at most that
    many write tasks touch the day — file count per partition <= budget
    by construction, independent of upstream parallelism (AQE may merge
    tiny salt groups and land below it). At 100 TB the budget is sized
    as partition_bytes / target_file_bytes (~128-512 MB files); here
    the knob itself is what's under test.

    `cluster_by` sorts rows WITHIN each write task before the write, so
    parquet row groups inside every file hold disjoint value ranges of
    the cluster columns — the reader's row-group min/max statistics then
    skip whole groups for selective predicates (the plain-parquet form
    of clustering/Z-ordering, and the second half of the layout story:
    partition pruning cuts days, clustering cuts row groups within a
    day). `writer_options` passes parquet writer knobs through (tests
    shrink parquet.block.size to force multiple row groups per file)."""
    salt = F.pmod(F.hash(F.col(salt_col)), F.lit(files_per_partition))
    out = with_day(df, ts_col).repartition(F.col(DAY_COL), salt)
    if cluster_by:
        out = out.sortWithinPartitions(DAY_COL, *cluster_by)
    writer = out.write.mode(mode)
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.partitionBy(DAY_COL).parquet(path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    files_per_partition: int = 1,
    salt_col: str = "event_id",
    predicate: str | None = None,
) -> None:
    """Rewrite splintered partitions down to the file budget.

    Dynamic partition overwrite (`partitionOverwriteMode=dynamic`)
    replaces ONLY the partitions present in the rewritten frame —
    `predicate` (e.g. "event_date >= '2024-06-01'") limits the pass to
    recent partitions, the standard incremental-compaction shape; older
    partitions are untouched bytes. Safe to re-run: the rewrite is a
    deterministic function of the data, not of the file layout it
    replaces.

    Atomicity boundary (honest, r15 audit): dynamic overwrite commits
    partition-by-partition through the Hadoop committer (delete old
    files, move staged ones in) — a crash INSIDE one partition's
    delete-to-move window can lose that partition until the
    deterministic rewrite is re-run.  Re-running converges (same
    bytes), but a reader in the gap sees a hole.  Where the gap is
    unacceptable, compact through the manifest-committed path instead
    (sources/versioned.py compact_versioned: immutable files + an
    atomic manifest swap, old version readable throughout)."""
    df = spark.read.parquet(path)
    if predicate is not None:
        df = df.filter(predicate)
    salt = F.pmod(F.hash(F.col(salt_col)), F.lit(files_per_partition))
    writer = (
        df.repartition(F.col(DAY_COL), salt)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(DAY_COL)
    )
    writer.parquet(path)

"""Small-file compaction planning + execution under the hash gate
(round 11) — the lakehouse maintenance job the storage family still
lacked: a streaming ingest leaves each day partition as dozens of tiny
files (one per micro-batch/task), and scan throughput dies on open
overhead long before data volume matters.  This query builds exactly
that pathology (a day-partitioned events lake written FRAG_FILES ways
per day), plans compaction as row-count bin-packing (target =
ceil(rows / ROWS_PER_FILE) files per day), EXECUTES the rewrite, and
reads both sides back through Spark so the plan and the execution are
hash-gated: per day the row count, the planned file count, the ACTUAL
post-compaction file count (from a filesystem listing), and a
row-preservation flag — a compactor that loses rows, skips a
partition, or writes off-plan file counts goes hash-red or trips the
in-query assertions.

No analog in the reference (SURVEY §2.1); storage extension surface
next to store_gc_plan / the z-order lake audits — an O(write)
verification query, excluded from the bench headline set.

Determinism: every output column derives from the events table's
content (day row counts and integer arithmetic) or equals it by
assertion (the executed layout).  The fragmented layout itself is
deterministic too (event_id % FRAG_FILES bucketing), and asserted.

Scale posture: the compactor is the real pattern — one hash
repartition on the partition column co-locates each day in a single
task (AQE may merge small days into one task, never split one), and
the writer's maxRecordsPerFile option does the bin-packing natively.  At 100 TB the
plan is manifest arithmetic per partition and only rewritten
partitions move; a production compactor would also skip days already
at target (planned here: days with files_before == target)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

FRAG_FILES = 6  # fragmented ingest: files per day before compaction
ROWS_PER_FILE = 128  # compaction bin size (row-count proxy for bytes;
# sized so the sf0.01 fixture's ~300-360-row days pack into 3 files —
# the multi-file branch of the plan is exercised, not just merge-to-1)

_COMPACT_SQL = f"""
    WITH daily AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events GROUP BY day
    )
    SELECT day, n_rows,
           CAST((n_rows + {ROWS_PER_FILE} - 1) // {ROWS_PER_FILE} AS BIGINT)
               AS target_files,
           CAST((n_rows + {ROWS_PER_FILE} - 1) // {ROWS_PER_FILE} AS BIGINT)
               AS files_after,
           CAST(1 AS INT) AS rows_match
    FROM daily
"""


def _day_file_counts(root: str) -> dict[str, int]:
    from pathlib import Path

    out: dict[str, int] = {}
    for d in Path(root).glob("day=*"):
        if d.is_dir():
            out[d.name.split("=", 1)[1]] = sum(
                1 for f in d.glob("*.parquet") if f.is_file()
            )
    return out


@register(
    "store_compaction_plan",
    oracle=_COMPACT_SQL,
    tags=("storage", "events", "agg"),
    side_effects=True,
)
def store_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, n_rows, target_files, files_after, rows_match) per day:
    the compaction plan (ceil(rows/ROWS_PER_FILE) target files) and its
    executed outcome — files_after is the real post-rewrite filesystem
    count and rows_match compares per-day row counts across the
    rewrite; in-query assertions pin the fragmented before-state."""
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="bigbugdata-compact-")
    try:
        frag_path = f"{base}/frag"
        compact_path = f"{base}/compact"
        ev = table(spark, sf_dir, "events").select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_id",
            "user_id",
            "event_type",
        )
        # the pathology: FRAG_FILES-way fragmented ingest per day,
        # built as FRAG_FILES sequential micro-batch APPENDS (each
        # coalesce(1) batch writes exactly one file into every day dir
        # it touches) — the real streaming-ingest layout, and
        # deterministic where a single repartition("day","bucket")
        # write is not (AQE coalesces the tiny exchange into one task
        # -> one file per day, erasing the pathology; measured)
        for b in range(FRAG_FILES):
            (
                ev.filter(F.col("event_id") % FRAG_FILES == b)
                .coalesce(1)
                .write.partitionBy("day")
                .mode("append" if b else "overwrite")
                .parquet(frag_path)
            )
        before = _day_file_counts(frag_path)
        # per-day expectation = the day's count of NON-EMPTY residue
        # classes (ADVICE r11: a sparse day with fewer events than
        # FRAG_FILES residues legitimately writes fewer files — the
        # old all-days-have-all-residues assertion hard-failed there)
        expected = {
            r["day"]: r["n_files"]
            for r in ev.select(
                "day", (F.col("event_id") % FRAG_FILES).alias("residue")
            )
            .distinct()
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias("n_files"))
            .collect()
        }
        expected = {str(d): n for d, n in expected.items()}
        got = {str(d): n for d, n in before.items()}
        if not got or got != expected or any(
            n > FRAG_FILES for n in got.values()
        ):
            raise AssertionError(
                f"fragmented layout off-spec (want per-day non-empty "
                f"residue counts {expected}): {got}"
            )
        # the compactor: co-locate each day in one task (hash
        # repartition on the partition column — AQE may merge several
        # days into a task but never splits one), then let the writer's
        # maxRecordsPerFile do the bin-packing — Spark's native
        # compaction primitive, yielding exactly
        # ceil(day_rows / ROWS_PER_FILE) files per day directory
        frag = spark.read.parquet(frag_path)
        (
            frag.repartition("day")
            .write.option("maxRecordsPerFile", ROWS_PER_FILE)
            .partitionBy("day")
            .mode("overwrite")
            .parquet(compact_path)
        )
        after = _day_file_counts(compact_path)
        plan = (
            ev.groupBy("day")
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .withColumn(
                "target_files",
                F.expr(f"(n_rows + {ROWS_PER_FILE} - 1) div {ROWS_PER_FILE}"),
            )
        )
        post = (
            spark.read.parquet(compact_path)
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias("rows_after"))
        )
        after_df = spark.createDataFrame(
            [(d, n) for d, n in sorted(after.items())],
            "day string, files_after long",
        )
        return (
            plan.join(post, "day")
            .join(F.broadcast(after_df), "day")
            .select(
                "day",
                "n_rows",
                "target_files",
                "files_after",
                (F.col("rows_after") == F.col("n_rows"))
                .cast("int")
                .alias("rows_match"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)

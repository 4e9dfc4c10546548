"""Incremental SCD2 maintenance sink — the streaming twin of
operators/scd.py's evt_user_state_history (VERDICT r6 #8: stateful
history x incremental storage, the one extension-family combination not
previously demonstrated).

The maintained state is the RUN SET (user_id, state, vf, first_eid,
n_events, last_eid): one row per maximal same-state stretch. Runs merge
associatively across time-ordered event slices — only a micro-batch's
FIRST run per user can fuse with the stored LAST run of that user, and
only when the state matches — so per-batch maintenance is a bounded
merge, not a recompute. The presentation contract (valid_from/valid_to/
is_current chaining) is derived at read time by the SAME format_runs
the batch query uses, so the two paths cannot diverge in contract.

Layout & incrementality: the run table is hash-bucket-partitioned on
user_id (`user_bucket=pmod(hash(user_id), n)`), and each batch rewrites
ONLY the buckets containing its users via dynamic partition overwrite —
per-batch cost is O(batch + affected-bucket bytes), and since run rows
are change-bounded (not event-bounded) the bucket bytes stay small
regardless of how many events flowed through.

Delivery guarantee — idempotent under foreachBatch replay, unlike the
plain append sinks (streaming/sink.py): the file-source batch content
is deterministic per batch id, the bucket rewrite is a deterministic
dynamic overwrite, and the merge is guarded by the engine's
(ts, event_id) total order: a per-user HIGH-WATER MARK (the stored max
(last_ts, last_eid)) drops every replayed batch run wholesale — even
one that was previously FUSED into an earlier-vf run, where a key-level
duplicate check is blind — and the fusion step additionally skips
candidates the mark already covers. Replaying a committed batch
therefore reproduces the identical table instead of double-counting
n_events (asserted in tests/test_streaming.py).

In-order contract: per user, batches must arrive in (ts, event_id)
order — the natural shape of time-sliced log ingest, and what the
availableNow file source delivers for slice-per-file directories. An
out-of-order slice would interleave inside closed runs, which run-level
state cannot repair; that replay/backfill case needs the batch
recompute (evt_user_state_history) over the affected range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

# operators.scd precedes this module in registry._QUERY_MODULES, so the
# top-level import cannot perturb the driver's cap order
from bigbugdata_spark.catalog import table
from bigbugdata_spark.operators.scd import SCD2_ORACLE_SQL
from bigbugdata_spark.registry import register

BUCKET_COL = "user_bucket"
RUN_COLS = (
    "user_id", "state", "vf", "first_eid", "n_events", "last_ts", "last_eid"
)


def _with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        BUCKET_COL, F.pmod(F.hash(F.col("user_id")), F.lit(n_buckets))
    )


def upsert_state_runs(
    spark: SparkSession, batch: DataFrame, out_dir: str, n_buckets: int = 8
) -> None:
    """Merge one time-ordered micro-batch of events into the run table.

    Steps (all bounded by batch size + affected-bucket bytes):
      1. collapse the batch into runs (operators/scd.runs_from_events);
      2. candidate fusions = stored LAST run x batch FIRST run per user
         with equal state; skip candidates the table already absorbed
         (stored (last_ts, last_eid) >= batch's — the replay guard);
      3. rewrite affected buckets: stored runs minus the replaced last
         runs, plus batch runs minus absorbed firsts minus replay
         duplicates, plus the fused runs."""
    from bigbugdata_spark.operators.scd import runs_from_events

    runs_b = _with_bucket(runs_from_events(batch), n_buckets)
    try:
        stored = spark.read.parquet(out_dir)
    except AnalysisException:
        stored = None
    if stored is None:
        runs_b.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(out_dir)
        return

    affected = [r[0] for r in runs_b.select(BUCKET_COL).distinct().collect()]
    stored_aff = stored.filter(F.col(BUCKET_COL).isin(affected))

    # replay guard, part 1 — the per-user HIGH-WATER MARK: any batch run
    # whose last event is at or below the user's stored maximum
    # (last_ts, last_eid) is already incorporated (possibly FUSED into a
    # run with an earlier vf, so a key-level duplicate check cannot see
    # it) and is dropped wholesale. Under the in-order contract a fresh
    # batch's runs all sit strictly above the mark, so this only ever
    # removes replayed data.
    hw = stored_aff.groupBy("user_id").agg(
        F.max(F.struct("last_ts", "last_eid")).alias("_hw")
    )
    runs_b = (
        runs_b.join(hw, "user_id", "left")
        .filter(
            F.col("_hw").isNull()
            | (F.struct("last_ts", "last_eid") > F.col("_hw"))
        )
        .drop("_hw")
    )

    asc = Window.partitionBy("user_id").orderBy("vf", "first_eid")
    desc = Window.partitionBy("user_id").orderBy(
        F.col("vf").desc(), F.col("first_eid").desc()
    )
    firsts = (
        runs_b.withColumn("_rn", F.row_number().over(asc))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    last_s = (
        stored_aff.join(
            runs_b.select("user_id").distinct(), "user_id", "left_semi"
        )
        .withColumn("_rn", F.row_number().over(desc))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    cand = last_s.select(
        "user_id",
        "state",
        BUCKET_COL,
        F.col("vf").alias("s_vf"),
        F.col("first_eid").alias("s_first_eid"),
        F.col("n_events").alias("s_n"),
        F.col("last_ts").alias("s_last_ts"),
        F.col("last_eid").alias("s_last_eid"),
    ).join(
        firsts.select(
            "user_id",
            "state",
            F.col("vf").alias("b_vf"),
            F.col("first_eid").alias("b_first_eid"),
            F.col("n_events").alias("b_n"),
            F.col("last_ts").alias("b_last_ts"),
            F.col("last_eid").alias("b_last_eid"),
        ),
        ["user_id", "state"],
    )
    live = cand.filter(
        F.struct("s_last_ts", "s_last_eid") < F.struct("b_last_ts", "b_last_eid")
    )
    fused = live.select(
        "user_id",
        "state",
        F.col("s_vf").alias("vf"),
        F.col("s_first_eid").alias("first_eid"),
        (F.col("s_n") + F.col("b_n")).alias("n_events"),
        F.col("b_last_ts").alias("last_ts"),
        F.col("b_last_eid").alias("last_eid"),
        BUCKET_COL,
    )
    replaced = live.select(
        "user_id",
        F.col("s_vf").alias("vf"),
        F.col("s_first_eid").alias("first_eid"),
    )
    absorbed = cand.select(
        "user_id",
        F.col("b_vf").alias("vf"),
        F.col("b_first_eid").alias("first_eid"),
    )
    run_key = ["user_id", "vf", "first_eid"]
    keep_stored = stored_aff.join(replaced, run_key, "left_anti")
    keep_batch = (
        runs_b.join(absorbed, run_key, "left_anti")
        # replay guard for non-fused runs: already-present rows drop out
        .join(stored_aff.select(*run_key), run_key, "left_anti")
    )
    cols = [*RUN_COLS, BUCKET_COL]
    out = (
        keep_stored.select(*cols)
        .unionByName(keep_batch.select(*cols))
        .unionByName(fused.select(*cols))
        # break lineage from the table being dynamically overwritten
        # (same read-then-rewrite discipline as sources/partitioned.py's
        # compaction; the materialized frame is affected-buckets sized)
        .localCheckpoint()
    )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BUCKET_COL)
        .parquet(out_dir)
    )


def read_state_history(spark: SparkSession, out_dir: str) -> DataFrame:
    """The maintained table under the batch query's exact contract:
    format_runs chains valid_to / flags the open run at read time, so
    presentation logic exists in exactly one place."""
    from bigbugdata_spark.operators.scd import format_runs

    return format_runs(spark.read.parquet(out_dir).drop(BUCKET_COL))


def run_scd2_stream_sink(
    spark: SparkSession,
    src_glob: str,
    out_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 8,
    max_files_per_trigger: int = 1,
) -> None:
    """Drive a directory of time-sliced event parquet files through the
    incremental maintenance sink with availableNow (slice-per-trigger:
    the file source's mtime ordering delivers slices in write order)."""
    schema = spark.read.parquet(src_glob).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_glob)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _bid: upsert_state_runs(
                spark, batch, out_dir, n_buckets
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# calendar-week slice boundaries (events span 2024-01; same boundary
# style as events_ext's cohort queries) — each slice is one "log file"
# arriving in order
_SLICE_BOUNDS = ("2024-01-08", "2024-01-16", "2024-01-24")


@register(
    "evt_state_history_incremental",
    oracle=SCD2_ORACLE_SQL,
    tags=("events", "streaming", "window"),
)
def evt_state_history_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end incremental SCD2: time-slice the events table into
    four week files (the log-ingest shape), stream them slice-per-
    trigger through the run-set maintenance sink, and return the
    maintained table under the batch contract. The oracle is the SAME
    SQL as evt_user_state_history — four incremental merges must
    reproduce the one-shot batch derivation hash-exactly, which pins
    the fusion logic (vf/first_eid preservation, n_events summing,
    valid_to chaining across slice boundaries) at value level."""
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="bigbugdata-scd2-")
    try:
        src, out, ckpt = f"{base}/src", f"{base}/table", f"{base}/ckpt"
        ev = table(spark, sf_dir, "events")
        bounds = (None, *_SLICE_BOUNDS, None)
        for i in range(len(bounds) - 1):
            sl = ev
            if bounds[i] is not None:
                sl = sl.filter(F.col("ts") >= F.lit(bounds[i]).cast("timestamp"))
            if bounds[i + 1] is not None:
                sl = sl.filter(
                    F.col("ts") < F.lit(bounds[i + 1]).cast("timestamp")
                )
            # one file per slice: slice == trigger under maxFilesPerTrigger=1
            sl.coalesce(1).write.mode("overwrite").parquet(f"{src}/slice_{i}")
        run_scd2_stream_sink(spark, f"{src}/slice_*/*.parquet", out, ckpt)
        # eager checkpoint so the returned frame no longer depends on the
        # scratch tree, which is deleted immediately — repeated bench/
        # parity invocations must not accumulate corpus-sized /tmp copies
        return read_state_history(spark, out).localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)

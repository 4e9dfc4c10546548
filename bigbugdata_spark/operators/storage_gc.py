"""Versioned-lake retention planning under the driver's hash gate
(round 10) — sources/versioned.py gained a VACUUM DRY RUN (gc_plan):
before destructive retention runs, the operator reads which data files
retention would delete and what is still readable afterwards.  This
query commits a three-version lifecycle (append-all, REPLACE with the
long-document slice, append the tiny-document re-admits), plans
retention of everything but the last two versions, then READS BOTH
SIDES OF THE PLAN back through Spark:

  * `live`        — the corpus as the retained head reads it;
  * `reclaimable` — the rows inside the files the plan marks deletable
                    (the expired v0 append's files, i.e. the FULL
                    original corpus, now only reachable pre-vacuum).

After the accounting is computed the plan is EXECUTED (expire_versions)
and the query asserts the head still reads exactly the live row count —
a wrong classification (a live file deleted, a dead file kept) either
shifts the aggregates (hash mismatch) or trips the assertion (errored
driver row).

No analog in the reference (SURVEY §2.1); storage extension surface.
Like corpus_version_diff / evt_zorder_lake_accounting this is an
O(write) verification query, excluded from the bench headline set.

Scale posture: the plan itself is manifest-arithmetic — file-count-
sized, no data motion; the reads are ordinary pruned parquet scans over
explicit file lists.  At 100 TB the dry run costs a manifest-directory
listing; only the verification reads here are corpus-sized, and they
exist to put the classification under the hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

#: replacement keeps long documents; the re-admit batch brings back tiny
#: ones — two disjoint slices so live vs reclaimable aggregates differ.
_LONG_CHARS = 500
_TINY_CHARS = 100

_GC_SQL = f"""
    SELECT 'live' AS status,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE n_chars >= {_LONG_CHARS} OR n_chars < {_TINY_CHARS}
    UNION ALL
    SELECT 'reclaimable',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_chars) AS BIGINT)
    FROM documents
"""


@register(
    "store_gc_plan",
    oracle=_GC_SQL,
    tags=("storage", "agg"),
    side_effects=True,
)
def store_gc_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-row retention card (status, n_docs, total_chars): `live` =
    what the retained head reads after vacuum (the replace slice plus
    the re-admit batch), `reclaimable` = the rows in the files the dry
    run marks deletable (the expired original append = the full
    corpus).  In-query assertions: the reclaimable file list is exactly
    the v0 stage plus one planted commit-tmp debris file (the r16
    manifest-tmp classification, proven under the gate), and executing
    the plan deletes exactly those files while the head re-reads the
    live count."""
    import shutil
    import tempfile

    from bigbugdata_spark.sources.versioned import (
        expire_versions,
        gc_plan,
        read_versioned,
        write_versioned,
        replace_versioned,
    )

    base = tempfile.mkdtemp(prefix="bigbugdata-gc-")
    try:
        path = f"{base}/corpus"
        docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
        write_versioned(docs, path)  # v0: the full original corpus
        replace_versioned(
            docs.filter(F.col("n_chars") >= _LONG_CHARS), path
        )  # v1: curation rewrote the table to the long slice
        write_versioned(
            docs.filter(F.col("n_chars") < _TINY_CHARS), path
        )  # v2: the tiny-document re-admit append
        # min_age_s=0: this scratch table is single-writer by
        # construction (freshly built in this query body), so the
        # in-flight gate that protects concurrent writers' uncommitted
        # stages (versioned.py r15) would misread the seconds-old
        # fixture files; 0 skips the gate entirely — classification is
        # byte-identical to the pre-gate behavior
        # plant a dead writer's commit-tmp debris (r16: gc_plan also
        # classifies '_manifests/.v*.json.tmp-*'; min_age_s=0 sends it
        # straight to reclaimable) so the sweep accounting below runs
        # with BOTH reclaimable kinds present under the hash gate
        from pathlib import Path

        debris_rel = "_manifests/.v99.json.tmp-fixture"
        (Path(path) / debris_rel).write_text("{}")
        plan = gc_plan(path, retain_last=2, min_age_s=0.0)
        if plan["retained"] != [1, 2] or plan["expired"] != [0]:
            raise AssertionError(f"unexpected retention split: {plan}")
        reclaim_paths = [f["path"] for f in plan["reclaimable_files"]]
        if not reclaim_paths or any(p in plan["live_files"] for p in reclaim_paths):
            raise AssertionError("reclaimable overlaps live file set")
        # only data files hold rows — manifest-tmp debris is swept by
        # the same plan but must never reach a parquet read
        data_paths = [p for p in reclaim_paths if p.startswith("data/")]
        if debris_rel not in reclaim_paths:
            raise AssertionError("commit-tmp debris missed by the plan")
        if set(reclaim_paths) != set(data_paths) | {debris_rel}:
            raise AssertionError(f"off-plan reclaimables: {reclaim_paths}")
        reclaim = spark.read.parquet(
            *[f"{path}/{p}" for p in data_paths]
        )
        live = read_versioned(spark, path)  # head (v2) = replace + re-admit
        out = (
            live.select(F.lit("live").alias("status"), "n_chars")
            .unionByName(
                reclaim.select(
                    F.lit("reclaimable").alias("status"), "n_chars"
                )
            )
            .groupBy("status")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("total_chars"),
            )
        )
        result = out.localCheckpoint()
        live_rows = next(
            r.n_docs for r in result.collect() if r.status == "live"
        )
        acct = expire_versions(path, retain_last=2, min_age_s=0.0)
        if acct["deleted_files"] != len(reclaim_paths):
            raise AssertionError(f"vacuum deleted off-plan: {acct}")
        if read_versioned(spark, path).count() != live_rows:
            raise AssertionError("post-vacuum head diverged from plan")
        return result
    finally:
        shutil.rmtree(base, ignore_errors=True)

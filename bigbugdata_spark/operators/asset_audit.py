"""Landed-asset-table accounting under the driver's hash gate (round 9,
VERDICT r8 #5) — the binaryFile ingest + parquet landing
(sources/binary_files.py) was proven only by unit tests; this registers
a query that SYNTHESIZES a deterministic asset directory from a bounded
documents slice, runs the real ingest path (binaryFile scan ->
asset_id/modality derivation -> hash-repartitioned parquet landing),
and reports per-modality accounting read back from the LANDED table,
with a DuckDB twin over the documents table.  md5 digests ride along
(Spark md5(payload bytes) == DuckDB md5(text) == md5 of the UTF-8
encoding), so a payload corrupted anywhere in scan->land->read fails
the value-hash compare, not just a length check.

The fixture-synthesis collect is BOUNDED (the 1-in-10 doc_id slice at
test scale) and exists only to manufacture files for the gate — a real
ingest reads an existing directory; what this query measures is the
Spark plumbing from listing to landed scan.  In-query assertion: the
landing step must compact to exactly its target partition count (the
small-file story binaryFile landing exists for); violation raises ->
errored driver row.

No analog in the reference (SURVEY §2.1); multimodal/storage extension
surface.  O(write) verification query, excluded from the bench
headline set like corpus_version_diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

_SLICE_MOD, _SLICE_REM = 10, 7
_LAND_PARTITIONS = 2
#: hard ceiling on the fixture-synthesis collect (VERDICT r9 watch #3):
#: the 1-in-_SLICE_MOD slice is ~200 docs at the sf0.01 gate and ~2k at
#: bench SF; if a future SF pushes the slice past this, fail loudly
#: instead of silently materializing an unbounded driver-side fixture —
#: a real ingest reads an existing directory and never runs this step.
_FIXTURE_CAP = 5_000

ASSET_ORACLE_SQL = f"""
    WITH sliced AS (
        SELECT doc_id, text, lang,
               CASE WHEN (doc_id // {_SLICE_MOD}) % 2 = 0
                    THEN 'image' ELSE 'blob' END AS modality
        FROM documents
        WHERE doc_id % {_SLICE_MOD} = {_SLICE_REM}
    )
    SELECT modality,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT)
               AS total_bytes,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_payloads,
           MIN(lang || '/d' || lpad(CAST(doc_id AS VARCHAR), 8, '0'))
               AS first_asset,
           MAX(lang || '/d' || lpad(CAST(doc_id AS VARCHAR), 8, '0'))
               AS last_asset,
           MIN(md5(text)) AS min_digest
    FROM sliced GROUP BY modality
"""


@register(
    "mm_asset_lake_accounting",
    oracle=ASSET_ORACLE_SQL,
    tags=("multimodal", "storage", "agg"),
    side_effects=True,
)
def mm_asset_lake_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per landed modality: asset count, payload byte total, distinct-
    payload count, first/last root-relative asset_id, and the minimum
    payload md5 — computed from the LANDED parquet table after the full
    binaryFile ingest path, so the gate covers listing, root-relative
    id derivation (lang subdirectories exercise the dir part),
    extension->modality classification (.png vs .bin by quotient
    parity),
    payload byte fidelity, and the compaction write."""
    import shutil
    import tempfile
    from pathlib import Path

    from bigbugdata_spark.sources.binary_files import land_assets, read_assets

    base = tempfile.mkdtemp(prefix="bigbugdata-assets-")
    try:
        src = Path(base) / "raw"
        # bounded fixture synthesis (1-in-_SLICE_MOD docs at test SF):
        # files named <lang>/d<doc_id padded to 8>.<png|bin>, payload =
        # the UTF-8 text bytes
        sliced = (
            table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % _SLICE_MOD == _SLICE_REM)
            .select("doc_id", "text", "lang")
        )
        n_slice = sliced.count()
        if n_slice > _FIXTURE_CAP:
            raise RuntimeError(
                f"asset fixture slice is {n_slice} docs (> {_FIXTURE_CAP}): "
                "this gate's driver-side synthesis is test-scale-only — "
                "raise _SLICE_MOD or point a real ingest at an existing "
                "directory instead"
            )
        rows = sliced.collect()
        for r in rows:
            # the slice fixes doc_id mod _SLICE_MOD, so parity must come
            # from the quotient or one modality would never occur
            ext = "png" if (r["doc_id"] // _SLICE_MOD) % 2 == 0 else "bin"
            p = src / r["lang"] / f"d{r['doc_id']:08d}.{ext}"
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(r["text"].encode("utf-8"))
        landed_dir = f"{base}/landed"
        land_assets(
            read_assets(spark, str(src)),
            landed_dir,
            n_partitions=_LAND_PARTITIONS,
        )
        n_files = sum(
            1 for f in Path(landed_dir).iterdir() if f.suffix == ".parquet"
        )
        if n_files != _LAND_PARTITIONS:
            raise RuntimeError(
                f"landing compaction regressed: {n_files} parquet files "
                f"(target {_LAND_PARTITIONS})"
            )
        landed = spark.read.parquet(landed_dir)
        out = landed.groupBy("modality").agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct(F.md5("payload")).alias("n_distinct_payloads"),
            F.min("asset_id").alias("first_asset"),
            F.max("asset_id").alias("last_asset"),
            F.min(F.md5("payload")).alias("min_digest"),
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)

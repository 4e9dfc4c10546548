"""Raw-asset ingest via Spark's binaryFile source (round 8) — the
front door for multimodal data: a directory of image/audio/video files
on object storage becomes a DataFrame of (path, modificationTime,
length, content) without any custom reader code, and from there the
multimodal operators (operators/multimodal.py) take over. This module
adds the ingest conventions around the built-in source:

  * asset_id derivation from the path RELATIVE to the ingest root
    (the filename->sample_id projection pattern the kraken domain
    scan established, §2 op 2 — but root-relative, so same-named
    files in different subdirectories, the standard split-by-
    directory layout, never collide into one id);
  * modality classification from the extension, kept as a column so
    the decode dispatch downstream is a filter, not a reader branch;
  * pathGlobFilter / recursiveFileLookup pass-throughs (prune at the
    LISTING, before any bytes are read);
  * a parquet landing step that rewrites the one-file-per-row source
    layout into normal multi-row parquet with the payload as a binary
    column — the small-file compaction every asset lake needs before
    analytics touch it (binaryFile cannot split files, so a million
    small assets means a million tasks until this step).

Scale posture: binaryFile parallelizes by FILE; the landing write
repartitions by asset_id hash so downstream work is decoupled from
the source's file-size skew, and the landed table is the thing the
mm_* queries scan (columnar metadata pruning: reading just lengths
or modalities never touches payload bytes thanks to parquet column
pruning — the whole point of landing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MODALITY_BY_EXT = {
    "jpg": "image",
    "jpeg": "image",
    "png": "image",
    "wav": "audio",
    "mp3": "audio",
    "mp4": "video",
    "bin": "blob",
}


def read_assets(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Read a directory of raw asset files into
    (asset_id, modality, n_bytes, mtime, path, payload).

    asset_id = the ROOT-RELATIVE path with the extension stripped
    ('train/cat.jpg' -> 'train/cat'), so identically-named files in
    different subdirectories keep distinct ids; an extensionless name
    keeps its full relative form (never an empty id). Dot/underscore-
    leading files never reach the frame at all — Hadoop's default path
    filter hides them from the listing (pinned by test)."""
    import re

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)
    # Resolve the ingest root the same way Spark renders the `path`
    # column: through Hadoop's FileSystem.makeQualified, which yields
    # file:/... locally and the scheme-qualified URI (s3a://bucket/...,
    # hdfs://nn/...) on object storage — an os.path.abspath root would
    # silently no-op the prefix strip for any non-local scheme and turn
    # asset_id into the full URI (r8 advisory).
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    root_uri = fs.makeQualified(jpath).toString().rstrip("/") + "/"
    rel = F.regexp_replace(F.col("path"), "^" + re.escape(root_uri), "")
    fname = F.element_at(F.split(rel, "/"), -1)
    fstem = F.regexp_replace(fname, r"\.[^.]*$", "")
    dir_part = F.regexp_replace(rel, r"[^/]*$", "")
    # dotfiles/extensionless names keep their full relative form
    stem = F.when(F.length(fstem) > 0, F.concat(dir_part, fstem)).otherwise(rel)
    ext = F.lower(F.regexp_extract(fname, r"\.([^.]*)$", 1))
    modality = F.coalesce(
        *[
            F.when(ext == e, F.lit(m))
            for e, m in sorted(MODALITY_BY_EXT.items())
        ],
        F.lit("unknown"),
    )
    return raw.select(
        stem.alias("asset_id"),
        modality.alias("modality"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("mtime"),
        "path",
        F.col("content").alias("payload"),
    )


def land_assets(
    assets: DataFrame, out_dir: str, n_partitions: int = 8
) -> None:
    """Compact the one-row-per-file source frame into ordinary parquet,
    hash-repartitioned on asset_id so file sizes even out regardless of
    source skew. Payload bytes move executor-to-executor exactly once
    (this shuffle) and never to the driver."""
    (
        assets.repartition(n_partitions, "asset_id")
        .write.mode("overwrite")
        .parquet(out_dir)
    )

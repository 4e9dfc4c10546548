"""Manifest-versioned table (sources/versioned.py): snapshot isolation,
time travel, and the reproducible-training-run contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.sources.versioned import (
    latest_version,
    read_versioned,
    versions,
    write_versioned,
)


def _sig(df):
    """Order-free content signature: row count + xor/sum of row hashes."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash(*df.columns).cast("long")).alias("s"),
    ).first()
    return (row["n"], row["s"])


def test_versioned_time_travel_and_isolation(tmp_path, spark, sf_oracle):
    docs = table(spark, sf_oracle, "documents")
    first = docs.filter(F.col("doc_id") < 300)
    second = docs.filter(F.col("doc_id") >= 300)
    path = str(tmp_path / "corpus")

    v0 = write_versioned(first, path)
    assert v0 == 0 and latest_version(path) == 0
    sig_v0 = _sig(read_versioned(spark, path, 0))
    assert sig_v0 == _sig(first)

    v1 = write_versioned(second, path)
    assert v1 == 1 and latest_version(path) == 1
    # latest sees the union; the pinned v0 read is UNCHANGED by the
    # commit that happened after it — snapshot isolation
    assert _sig(read_versioned(spark, path)) == _sig(docs)
    assert _sig(read_versioned(spark, path, 0)) == sig_v0

    audit = versions(path)
    assert [a["version"] for a in audit] == [0, 1]
    assert audit[1]["n_files"] > audit[0]["n_files"]
    assert audit[1]["n_bytes"] > audit[0]["n_bytes"]
    assert audit[0]["parent"] is None and audit[1]["parent"] == 0


def test_versioned_unknown_version_fails_loudly(tmp_path, spark, sf_oracle):
    path = str(tmp_path / "corpus")
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, path)
    write_versioned(
        table(spark, sf_oracle, "documents").limit(10), path
    )
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, path, 5)


def test_versioned_reproducible_training_read(tmp_path, spark, sf_oracle):
    """The governance contract: a training job pins the version it read;
    later commits (new data arriving) never change what that pin
    returns."""
    docs = table(spark, sf_oracle, "documents")
    path = str(tmp_path / "corpus")
    pinned = write_versioned(docs.filter(F.col("lang") == "en"), path)
    sig_before = _sig(read_versioned(spark, path, pinned))
    for i in range(3):  # three more ingest cycles
        write_versioned(docs.filter(F.col("doc_id") % 7 == i), path)
    assert latest_version(path) == pinned + 3
    assert _sig(read_versioned(spark, path, pinned)) == sig_before


def test_versioned_concurrent_commits_lose_nothing(tmp_path, spark):
    """The optimistic-concurrency claim behind write_versioned's
    exclusive-create commit: N writers racing on the same table must all
    commit (distinct versions, every row visible at the final head) —
    with a blind os.replace rename, a losing writer's files silently
    vanish from every manifest."""
    from concurrent.futures import ThreadPoolExecutor

    path = str(tmp_path / "corpus")
    frames = [
        spark.createDataFrame([(i, f"writer {i}")], "id long, who string")
        for i in range(8)
    ]
    with ThreadPoolExecutor(max_workers=8) as ex:
        got = list(ex.map(lambda df: write_versioned(df, path), frames))
    assert sorted(got) == list(range(8))  # every writer got a distinct commit
    assert latest_version(path) == 7
    head = read_versioned(spark, path)
    assert head.count() == 8
    assert {r["id"] for r in head.collect()} == set(range(8))
    # every intermediate version is readable and monotone in size
    sizes = [read_versioned(spark, path, v).count() for v in range(8)]
    assert sizes == sorted(sizes) and sizes[-1] == 8


def test_versioned_additive_schema_evolution(tmp_path, spark):
    """Additive evolution: a later commit adds a column; the merged read
    of the head sees it null-extended over old files, while a PINNED
    read of the old version keeps exactly the old schema (a reproducing
    training job must not suddenly see new columns)."""
    path = str(tmp_path / "corpus")
    write_versioned(
        spark.createDataFrame([(1, "a")], "doc_id long, text string"), path
    )
    write_versioned(
        spark.createDataFrame(
            [(2, "b", 0.9)], "doc_id long, text string, quality double"
        ),
        path,
    )
    head = read_versioned(spark, path, merge_schema=True)
    assert set(head.columns) == {"doc_id", "text", "quality"}
    rows = {r["doc_id"]: r["quality"] for r in head.collect()}
    assert rows == {1: None, 2: 0.9}
    pinned = read_versioned(spark, path, 0)
    assert set(pinned.columns) == {"doc_id", "text"}
    assert pinned.count() == 1

"""JSONL ingest edge: roundtrip fidelity, corrupt-line quarantine, and
the partitioned corpus sink feeding partition-pruned scans."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.plans import inspect as I
from bigbugdata_spark.sources.jsonl import (
    read_documents_jsonl,
    split_quarantine,
    write_corpus_partitioned,
)


def test_jsonl_roundtrip_matches_parquet(tmp_path, spark, sf_oracle):
    """documents written as JSONL and read back == the parquet truth."""
    docs = table(spark, sf_oracle, "documents")
    rows = docs.collect()
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r.asDict()) + "\n")
    clean, bad = split_quarantine(read_documents_jsonl(spark, str(p)))
    assert bad.count() == 0
    got = {tuple(r) for r in clean.select(*docs.columns).collect()}
    want = {tuple(r) for r in rows}
    assert got == want


def test_jsonl_quarantines_corrupt_lines(tmp_path, spark):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2})
        + "\n"
        + "{this is not json\n"
        + json.dumps({"doc_id": 2, "text": "ok2", "lang": "de", "source": "s", "n_chars": 3})
        + "\n"
    )
    clean, bad = split_quarantine(read_documents_jsonl(spark, str(p)))
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    quarantined = [r["raw_line"] for r in bad.collect()]
    assert quarantined == ["{this is not json"]


def test_partitioned_corpus_sink_prunes(tmp_path, spark, sf_oracle):
    """write_corpus_partitioned -> per-lang directories -> a lang filter
    becomes a PartitionFilter (no data files of other langs opened)."""
    out = str(tmp_path / "corpus")
    write_corpus_partitioned(table(spark, sf_oracle, "documents"), out)
    df = spark.read.parquet(out).filter(F.col("lang") == "en").select("doc_id")
    scans = I.scan_info(df)
    assert scans and "lang" in scans[0]["partition_filters"]
    assert 0 < df.count() < spark.read.parquet(out).count()

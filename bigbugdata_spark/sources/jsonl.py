"""JSONL document ingestion — the interchange format most corpus drops
arrive in (one JSON object per line).  No analog in the reference (TSV
reports only); this is the ingest edge of the LLM-pipeline extension
surface.

Design: text scan + from_json with an EXPLICIT schema — never schema
inference (inference scans the data twice and locks the driver merging
per-partition schemas), and never the raw-JSON-scan corrupt-record
machinery (Spark rejects any query whose only referenced column on a raw
JSON scan is the internal corrupt column —
QUERY_ONLY_CORRUPT_RECORD_COLUMN — which makes quarantine counts
awkward).  from_json runs in PERMISSIVE mode with its own
corrupt-record field (a malformed line parses to a struct whose
`_corrupt_record` holds the raw text), so the quarantine split is a
plain null check carrying the raw line for replay; everything stays lazy
and line-splittable, so one large file still parallelizes and one bad
line never fails a 100 TB ingest."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


_PARSE_SCHEMA = T.StructType(
    list(DOCUMENTS_SCHEMA.fields) + [T.StructField("_corrupt_record", T.StringType())]
)


def read_documents_jsonl(spark: SparkSession, paths: list[str] | str) -> DataFrame:
    """documents-shaped JSONL scan: (raw_line, parsed struct). Callers
    split good from quarantined with `split_quarantine`."""
    return (
        spark.read.text(paths)
        .withColumnRenamed("value", "raw_line")
        .withColumn(
            "j",
            F.from_json(
                F.col("raw_line"),
                _PARSE_SCHEMA,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
            ),
        )
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows are the parsed struct flattened
    to the documents schema; the quarantine keeps the raw line (the
    replay unit after a parser fix)."""
    ok = F.col("j").isNotNull() & F.col("j._corrupt_record").isNull()
    clean = df.filter(ok).select(*[f"j.{f.name}" for f in DOCUMENTS_SCHEMA.fields])
    bad = df.filter(~ok).select("raw_line")
    return clean, bad


def write_corpus_partitioned(
    df: DataFrame, path: str, partition_cols: tuple[str, ...] = ("lang",)
) -> None:
    """Lang-partitioned parquet corpus sink — the layout the 100 TB
    docstrings assume: downstream per-language scans prune whole
    directories (asserted in tests/test_plans.py's partition-pruning
    test). Distributed write, no coalesce — file count per partition
    follows the upstream parallelism."""
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)

"""Per-column completeness profile (round 10) — the one-pass DQ card
every ingest lands on first: for EVERY column of a table, how many
rows, nulls, blank strings, and exact distinct values.  This is the
column-wise completeness sweep that precedes the targeted checks the
dq family already has (dq_constraint_violations pins specific rules,
dq_pk_uniqueness one key, prof_documents_columns types/widths); here
the whole table is profiled uniformly with no per-column configuration.

No analog in the reference (SURVEY §2.1); data-quality extension
surface.

Determinism: BIGINT counts only; values are profiled through their
canonical string cast so one schema-independent code path covers every
column type identically in both engines.

Scale posture: ONE table scan — columns unpivot map-side into
(col_name, value) pairs (a generate, no shuffle), then a single
groupBy(col_name) with a distinct-aggregate whose shuffle key is
(col_name, value): per-column cardinality-sized, spread over the value
domain, never a single-task column.  At 100 TB each column's distinct
count shuffles its vocabulary, not its row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.diagnostics import null_profile
from bigbugdata_spark.registry import register

_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def _one_col_sql(c: str) -> str:
    return f"""
        SELECT '{c}' AS col_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END),
                             0) AS BIGINT) AS n_null,
               CAST(COALESCE(SUM(CASE WHEN {c} IS NOT NULL
                                      AND TRIM(CAST({c} AS VARCHAR)) = ''
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_blank,
               CAST(COUNT(DISTINCT CAST({c} AS VARCHAR)) AS BIGINT)
                   AS n_distinct
        FROM documents"""


_NULLS_SQL = "\nUNION ALL\n".join(_one_col_sql(c) for c in _DOC_COLS)


@register(
    "dq_null_profile",
    oracle=_NULLS_SQL,
    tags=("dq", "profile"),
)
def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(col_name, n_rows, n_null, n_blank, n_distinct) for every column
    of documents — the uniform one-scan completeness card (the oracle
    spells it as one UNION ALL branch per column; the Spark plan
    unpivots map-side and profiles all columns in a single pass; the
    generic core, usable on any table, is
    functions.diagnostics.null_profile)."""
    return null_profile(table(spark, sf_dir, "documents"), list(_DOC_COLS))

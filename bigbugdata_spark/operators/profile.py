"""Data-quality profiling — the pre-ingest audit a large-scale
training-data pipeline runs before a corpus enters the pool: per-column
null counts and distinct cardinalities, plus an exact numeric summary of
the length column. Pure extension surface (the reference has no
profiling; SURVEY §2.1) in the spirit of tools like Deequ/dbt tests,
re-expressed as two single-scan Spark plans with DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")

_PROFILE_AGG_SQL = ", ".join(
    ["CAST(COUNT(*) AS BIGINT) AS n"]
    + [
        f"CAST(COUNT({c}) AS BIGINT) AS nn_{c}, "
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_{c}"
        for c in _DOC_COLS
    ]
)

_PROFILE_ROWS_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS column_name, n AS n_rows, n - nn_{c} AS n_nulls, "
    f"nd_{c} AS n_distinct FROM s"
    for c in _DOC_COLS
)


@register(
    "prof_documents_columns",
    oracle=f"""
        WITH s AS (SELECT {_PROFILE_AGG_SQL} FROM documents)
        {_PROFILE_ROWS_SQL}
    """,
    tags=("profile", "agg"),
)
def prof_documents_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the documents table: one row per column with
    (n_rows, n_nulls, n_distinct) — the null-rate / cardinality audit.

    Plan: ONE scan, one aggregate row, then inline() unpivots it to the
    5-row profile driver-free. The multi-COUNT(DISTINCT) aggregate plans
    an Expand (one input copy per distinct column — the documented cost
    of exact profiling); at 100 TB swap the distinct counts for
    approx_count_distinct the way text_vocab_approx does and the Expand
    disappears. Everything else is map-side combinable."""
    doc = table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _DOC_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    row = doc.agg(*aggs)
    profile = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n").alias("n_rows"),
                (F.col("n") - F.col(f"nn_{c}")).alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
            )
            for c in _DOC_COLS
        ]
    )
    return row.select(F.inline(profile))


@register(
    "prof_length_summary",
    oracle="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(n_chars) AS BIGINT) AS min_chars,
               CAST(MAX(n_chars) AS BIGINT) AS max_chars,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
               CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_short,
               CAST(SUM(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_len_mismatch
        FROM documents
        GROUP BY source
    """,
    tags=("profile", "agg"),
)
def prof_length_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length audit: min/max/total/mean document length, a
    short-document count (the truncation signal), and a CONSISTENCY
    check — rows whose stored n_chars disagrees with length(text), the
    kind of metadata drift that silently poisons downstream filters.

    Plan: single scan, one shuffle on source, every aggregate exact
    integer (the mean divides two exact ints in fp64)."""
    doc = table(spark, sf_dir, "documents")
    return doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0)).alias("n_short"),
        F.sum(
            F.when(F.length("text") != F.col("n_chars"), 1).otherwise(0)
        ).alias("n_len_mismatch"),
    )

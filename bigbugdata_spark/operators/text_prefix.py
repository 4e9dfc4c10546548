"""Template-prefix duplicate detection (round 8) — documents that share
their OPENING: boilerplate headers, form letters, scraped templates
("dear customer, ..."). Full-document dedup misses these when bodies
diverge; containment catches doc-inside-doc but not shared openings
on otherwise-different documents. Grouping on the first-K-token hash
prefix is the standard cheap template detector that runs before any
pairwise machinery.

No analog in the reference (SURVEY §2.1); text/dedup extension surface
next to dedup_containment / text_dup_span_coverage.

Scale posture: ONE scan, a per-row prefix projection (slice of the
token-hash array — JVM-side, no explode), and a hash-aggregate whose
key is the joined prefix string: map-side combine collapses each
partition's template copies before the exchange, exactly like
dedup_exact, and only groups with >= 2 docs survive to the
template-count-sized output. No pairs are ever generated.

Determinism discipline: the prefix key is the comma-joined rolling
word hashes (functions/hashing.py — bit-identical cross-engine); all
outputs are exact counts / MIN ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.registry import register

PREFIX_TOKENS = 8  # shared-opening length that counts as a template


@register(
    "text_template_prefix",
    oracle=f"""
        WITH pre AS (
            SELECT doc_id,
                   array_to_string(
                       list_slice({H.sql_word_hashes(H.sql_tokens('text'))},
                                  1, {PREFIX_TOKENS}), ',') AS prefix_key,
                   len({H.sql_tokens('text')}) AS n_toks
            FROM documents
            WHERE len({H.sql_tokens('text')}) >= {PREFIX_TOKENS}
        )
        SELECT prefix_key,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS keep_id
        FROM pre GROUP BY prefix_key
        HAVING COUNT(*) >= 2
    """,
    tags=("text", "dedup", "agg"),
)
def text_template_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template clusters: groups of documents sharing their first
    PREFIX_TOKENS word hashes — per cluster the doc count and the
    lowest doc_id (the canonical copy a keep-one policy retains).
    Documents shorter than the prefix are excluded (a short doc is not
    a template of a longer one — that is containment's job)."""
    toks = H.tokens(F.col("text"))
    pre = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            ",", F.slice(H.word_hashes(toks), 1, PREFIX_TOKENS)
        ).alias("prefix_key"),
        F.size(toks).alias("n_toks"),
    ).where(F.col("n_toks") >= PREFIX_TOKENS)
    return (
        pre.groupBy("prefix_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
        .where(F.col("n_docs") >= 2)
    )

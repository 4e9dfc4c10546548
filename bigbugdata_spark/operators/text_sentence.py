"""Sentence-level corpus statistics (round 12) — the quality signal
between the character/token level (text_token_stats, quality score)
and the document level: sentences per document and sentence-length
shape per language.  Long-sentence and one-sentence-document rates are
standard pretraining-corpus filters (boilerplate and run-on detection)
that none of the existing text queries expose.

Sentence segmentation is DEFINED (engine-portable, not linguistic):
sentences are the non-empty trimmed segments of `text` split on one or
more of [.!?] — the same class of deterministic approximation as the
whitespace tokenizer.  All reported ratios are integer permille.

No analog in the reference (SURVEY §2.1); text extension surface.

Scale posture: one documents scan -> per-doc sentence array (map-side
regexp) -> explode for the length stats with a per-doc pre-aggregate
first, so the shuffle carries per-(doc) rows, not per-sentence rows;
the final rollup is |lang|-keyed and map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

#: a sentence longer than this many characters counts as run-on
LONG_SENT_CHARS = 200

_SENT_ORACLE_SQL = f"""
    WITH per_doc AS (
        SELECT lang,
               len(sents) AS n_sents,
               COALESCE(list_sum(list_transform(sents, s -> length(s))), 0)
                   AS sent_chars,
               COALESCE(list_sum(list_transform(
                   sents, s -> CASE WHEN length(s) > {LONG_SENT_CHARS}
                               THEN 1 ELSE 0 END)), 0) AS n_long
        FROM (
            SELECT lang,
                   list_filter(
                       list_transform(string_split_regex(text, '[.!?]+'),
                                      s -> trim(s)),
                       s -> s != '') AS sents
            FROM documents
        )
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_sents) AS BIGINT) AS n_sentences,
           CAST(SUM(sent_chars) AS BIGINT) AS sentence_chars,
           CAST(SUM(CASE WHEN n_sents = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS one_sentence_docs,
           CAST(SUM(n_long) AS BIGINT) AS long_sentences,
           CAST(SUM(n_long) * 1000 // GREATEST(SUM(n_sents), 1) AS BIGINT)
               AS long_sent_pm
    FROM per_doc GROUP BY lang
"""


@register(
    "text_sentence_stats",
    oracle=_SENT_ORACLE_SQL,
    tags=("text", "agg"),
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, n_sentences, sentence_chars, one_sentence_docs,
    long_sentences, long_sent_pm): per-language sentence segmentation
    stats under the defined [.!?]+ splitter; ratios integer permille."""
    docs = table(spark, sf_dir, "documents").select(
        "lang",
        F.expr(
            "filter(transform(split(text, '[.!?]+'), s -> trim(s)),"
            " s -> s != '')"
        ).alias("sents"),
    )
    per_doc = docs.select(
        "lang",
        F.size("sents").alias("n_sents"),
        F.coalesce(
            F.expr("aggregate(sents, 0, (acc, s) -> acc + length(s))"),
            F.lit(0),
        ).alias("sent_chars"),
        F.coalesce(
            F.expr(
                f"aggregate(sents, 0, (acc, s) -> acc + "
                f"CASE WHEN length(s) > {LONG_SENT_CHARS} THEN 1 ELSE 0 END)"
            ),
            F.lit(0),
        ).alias("n_long"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_sents").cast("long").alias("n_sentences"),
        F.sum("sent_chars").cast("long").alias("sentence_chars"),
        F.sum(F.when(F.col("n_sents") == 1, 1).otherwise(0))
        .cast("long")
        .alias("one_sentence_docs"),
        F.sum("n_long").cast("long").alias("long_sentences"),
        F.expr("sum(n_long) * 1000 div greatest(sum(n_sents), 1)")
        .cast("long")
        .alias("long_sent_pm"),
    )

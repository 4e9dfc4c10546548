"""Cross-document boilerplate detection (round 12) — the corpus-level
consumer of text_sentence's segmenter: a sentence (normalized: trimmed,
lowercased) that recurs in BOILER_MIN_DOCS or more distinct documents
is boilerplate (headers, footers, cookie banners, license blurbs) — the
standard pretraining-corpus cleanup signal BETWEEN document-level
near-dup (whole doc similar) and span-level n-gram overlap (any shared
window): exact repetition of a complete sentence across unrelated
documents.

Output is per-language accounting (bounded, dashboard-shaped): how many
distinct boilerplate sentences, how many sentence OCCURRENCES they
explain, total sentences, and the integer-permille boilerplate rate —
the number a cleanup pass quotes as its expected deletion volume.

No analog in the reference (SURVEY §2.1); text extension surface.

Scale posture: one documents scan -> per-(doc, sentence) DISTINCT
(map-side dedupable) -> sentence-keyed df count (one shuffle on the
sentence key) -> join back per occurrence on the same key (exchange
reuse: both sides hash-partitioned on sentence) -> |lang|-keyed rollup.
At 100 TB the sentence key shuffles as a 64-bit hash instead of the
string (same plan, narrower shuffle; kept as the string here so the
oracle groups on identical values with zero collision caveats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

#: a normalized sentence in >= this many distinct docs is boilerplate
BOILER_MIN_DOCS = 3

_BOILER_ORACLE_SQL = f"""
    WITH sents AS (
        SELECT doc_id, lang, lower(s) AS sent
        FROM (
            SELECT doc_id, lang,
                   unnest(list_filter(
                       list_transform(string_split_regex(text, '[.!?]+'),
                                      x -> trim(x)),
                       x -> x != '')) AS s
            FROM documents
        )
    ),
    doc_sents AS (
        SELECT DISTINCT doc_id, lang, sent FROM sents
    ),
    df AS (
        SELECT sent, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM doc_sents GROUP BY sent
    ),
    flagged AS (
        SELECT s.lang, s.sent,
               CASE WHEN d.n_docs >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END
                   AS is_boiler
        FROM sents s JOIN df d ON s.sent = d.sent
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sentences,
           CAST(SUM(is_boiler) AS BIGINT) AS boiler_occurrences,
           CAST(COUNT(DISTINCT CASE WHEN is_boiler = 1 THEN sent END)
                AS BIGINT) AS boiler_distinct,
           CAST(SUM(is_boiler) * 1000 // COUNT(*) AS BIGINT) AS boiler_pm
    FROM flagged GROUP BY lang
"""


@register(
    "text_boilerplate",
    oracle=_BOILER_ORACLE_SQL,
    tags=("text", "agg", "join"),
)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_sentences, boiler_occurrences, boiler_distinct,
    boiler_pm): per-language boilerplate accounting — occurrences of
    normalized sentences recurring in >= BOILER_MIN_DOCS distinct docs,
    as counts and integer permille of all sentence occurrences."""
    sents = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "filter(transform(split(text, '[.!?]+'), x -> trim(x)),"
                " x -> x != '')"
            )
        ).alias("s"),
    ).select("doc_id", "lang", F.lower("s").alias("sent"))
    df_counts = (
        sents.select("doc_id", "sent")
        .distinct()
        .groupBy("sent")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    flagged = sents.join(df_counts, "sent").select(
        "lang",
        "sent",
        F.when(F.col("n_docs") >= BOILER_MIN_DOCS, 1).otherwise(0).alias(
            "is_boiler"
        ),
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sentences"),
        F.sum("is_boiler").cast("long").alias("boiler_occurrences"),
        F.count_distinct(
            F.when(F.col("is_boiler") == 1, F.col("sent"))
        )
        .cast("long")
        .alias("boiler_distinct"),
        F.expr("sum(is_boiler) * 1000 div count(*)")
        .cast("long")
        .alias("boiler_pm"),
    )

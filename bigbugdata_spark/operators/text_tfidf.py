"""Per-document TF-IDF keyword extraction (round 11) — the classic
"what is this document about" signal the text family lacked:
text_term_frequencies ranks terms per LANGUAGE and text_bm25_rank
scores documents for a QUERY; this ranks each document's OWN terms by
tf x rarity, the standard keyword/topic-tag extractor a curation or
retrieval pipeline runs corpus-wide.

No analog in the reference (SURVEY §2.1); text extension surface.

Scoring is EXACT INTEGER (the repo's cross-engine discipline): the
idf weight is folded as score = (tf * 1_000_000) div df — monotone in
the tf/df ratio (the log in textbook idf is monotone too, so top-k
membership under ln(N/df) vs N/df can differ only through tf
interactions; this variant IS the documented scoring, applied
identically in both engines — no fp log whose last-ulp could diverge).
Ties break (score DESC, term ASC).

Scale posture: one documents scan -> explode tokens -> two hash aggs
((doc, term) tf and term df — both map-side combinable) -> broadcast
the term-df table back onto the per-doc counts (df table is
vocabulary-sized) -> one per-doc top-k window over that doc's DISTINCT
terms (doc-vocabulary-sized partitions, never corpus-wide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.registry import register

TOP_TERMS = 5
_SCALE = 1_000_000


@register(
    "text_tfidf_topk",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({H.sql_tokens('text')}) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks WHERE term != '' GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM toks WHERE term != '' GROUP BY term
        ),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   CAST(tf.tf * {_SCALE} // df.df AS BIGINT) AS score,
                   ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * {_SCALE} // df.df DESC, tf.term ASC
                   ) AS rnk
            FROM tf JOIN df ON tf.term = df.term
        )
        SELECT doc_id, term, tf, df, score, CAST(rnk AS BIGINT) AS rnk
        FROM scored WHERE rnk <= {TOP_TERMS}
    """,
    tags=("text", "window", "agg"),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, tf, df, score, rnk): each document's TOP_TERMS
    terms by exact-integer tf-idf score (tf * 1e6 div document
    frequency), ties to the lexicographically smaller term."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(H.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.expr(f"tf * {_SCALE} div df").alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_TERMS)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )

"""Dedup lineage / removal attribution (round 11) — the provenance
table a governed corpus release actually ships next to its manifest:
for EVERY document, which stage of the dedup ladder removed it
('exact' content dedup, then 'near' n-gram-Jaccard clustering over the
exact survivors, else 'kept'), and the ultimate surviving document its
content is represented by.  dedup_exact / dedup_cluster_keep each
answer their own stage; a data-removal request, a contamination
traceback, or a "why did my document disappear" audit needs the
COMPOSED attribution with precedence — exact removal wins (near-dup
clustering never saw the document), and an exact survivor whose
cluster rep is elsewhere chains to THAT rep's survivor.

No analog in the reference (SURVEY §2.1); corpus-governance extension
surface composing the dedup ladder.

Stage semantics (identical in both engines): stage-1 groups documents
by full text (at 100 TB, group by sha256(text) — same partition of the
corpus, cheaper shuffle key) and keeps the minimum doc_id per content
group; stage-2 builds the exact word-3-gram Jaccard >= JACCARD_T pair
graph RESTRICTED to stage-1 survivors, takes connected components,
and keeps the minimum doc_id per component.  survivor_id chains:
removed-at-exact documents map to their content rep's COMPONENT rep,
so every row points at a document with stage = 'kept'.

Scale posture: stage 1 is one content-keyed hash agg (map-side
combinable); stage 2 is dedup_ngram_jaccard's inverted-index join
(stop-gram cap available) + the O(log n) star-contraction components,
restricted by broadcast-able survivor semi-joins; the final assembly
is two broadcast lookups against component-sized frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import JACCARD_PAIRS_SQL
from bigbugdata_spark.registry import register

_LINEAGE_SQL = f"""
    WITH RECURSIVE ex AS (
        SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY text) AS ex_rep
        FROM documents
    ),
    r1 AS (SELECT doc_id FROM ex WHERE doc_id = ex_rep),
    pairs0 AS ({JACCARD_PAIRS_SQL}),
    pairs AS (
        SELECT p.d1, p.d2 FROM pairs0 p
        JOIN r1 a ON p.d1 = a.doc_id
        JOIN r1 b ON p.d2 = b.doc_id
    ),
    edges AS (
        SELECT d1 AS a, d2 AS b FROM pairs
        UNION SELECT d2 AS a, d1 AS b FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
        SELECT r1.doc_id,
               CAST(LEAST(r1.doc_id, COALESCE(MIN(r.b), r1.doc_id))
                    AS BIGINT) AS component
        FROM r1 LEFT JOIN reach r ON r1.doc_id = r.a
        GROUP BY r1.doc_id
    )
    SELECT e.doc_id,
           CASE WHEN e.doc_id != e.ex_rep THEN 'exact'
                WHEN e.doc_id != c.component THEN 'near'
                ELSE 'kept' END AS stage,
           CAST(c.component AS BIGINT) AS survivor_id
    FROM ex e JOIN comp c ON e.ex_rep = c.doc_id
"""


@register(
    "corpus_dedup_lineage",
    oracle=_LINEAGE_SQL,
    tags=("corpus", "dedup", "pipeline", "iterative"),
)
def corpus_dedup_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, stage, survivor_id): per document, the dedup-ladder
    stage that removed it ('exact' | 'near' | 'kept') and the ultimate
    kept document representing its content (survivor_id chains through
    both stages; every survivor_id row has stage = 'kept')."""
    from bigbugdata_spark.functions.graph import connected_components
    from bigbugdata_spark.operators.dedup import dedup_ngram_jaccard

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    ex = docs.groupBy("text").agg(F.min("doc_id").alias("ex_rep"))
    doc_rep = docs.join(ex, "text").select("doc_id", "ex_rep")
    r1 = doc_rep.filter(F.col("doc_id") == F.col("ex_rep")).select("doc_id")

    pairs = (
        dedup_ngram_jaccard(spark, sf_dir)
        .join(F.broadcast(r1.withColumnRenamed("doc_id", "d1")), "d1", "left_semi")
        .join(F.broadcast(r1.withColumnRenamed("doc_id", "d2")), "d2", "left_semi")
        .select(F.col("d1").alias("a"), F.col("d2").alias("b"))
    )
    comp = connected_components(r1, pairs, id_col="doc_id").select(
        F.col("id").alias("ex_rep"), "component"
    )
    return doc_rep.join(comp, "ex_rep").select(
        "doc_id",
        F.when(F.col("doc_id") != F.col("ex_rep"), F.lit("exact"))
        .when(F.col("doc_id") != F.col("component"), F.lit("near"))
        .otherwise(F.lit("kept"))
        .alias("stage"),
        F.col("component").alias("survivor_id"),
    )

"""Windowed term co-occurrence (round 11) — the corpus statistic under
every classical embedding trainer (word2vec/GloVe build exactly this
table first): for every unordered term pair within a +-COOC_WINDOW
token window, the exact corpus-wide co-occurrence count; reported as
the top COOC_TOPK pairs.  Next to text_term_frequencies (unigrams)
and text_bigram_lm (adjacent pairs, directional) this completes the
distributional-statistics ladder with the skip-window pair table.

No analog in the reference (SURVEY §2.1); text extension surface.

Pair generation is JOIN-FREE (the scale property that matters): for
each offset d in 1..COOC_WINDOW, the token ARRAY pairs t[i] with
t[i+d] via a JVM array transform — per document that is
sum_d (len - d) pairs emitted map-side, no self-join on position, no
shuffle before the count aggregate.  Pairs are canonicalized
(least, greatest) so the table is symmetric-unordered; self-pairs
(t[i] == t[i+d]) are kept — a repeated term co-occurring with itself
is real signal (and text_repetition_stats' concern, not ours to drop).

Scale posture: one documents scan -> map-side pair explosion (W x
corpus tokens rows, W fixed) -> one map-side-combinable (a, b) count
aggregate -> TakeOrderedAndProject top-k.  The count key space is
vocabulary^2-bounded but Zipf-concentrated; a stop-cap like
dedup_ngram_jaccard's would bound a hot term's row share at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.registry import register

COOC_WINDOW = 2
COOC_TOPK = 25

_PAIRS_SQL = f"""
    list_transform(
        flatten(list_transform(range(1, {COOC_WINDOW} + 1),
            d -> list_transform(range(1, len(t) - d + 1),
                 i -> [t[i], t[i + d]]))),
        p -> {{'a': least(p[1], p[2]), 'b': greatest(p[1], p[2])}})
"""


@register(
    "text_cooc_topk",
    oracle=f"""
        WITH toks AS (
            SELECT list_filter({H.sql_tokens('text')}, x -> x != '') AS t
            FROM documents
        ),
        pairs AS (
            SELECT unnest({_PAIRS_SQL}) AS pr FROM toks WHERE len(t) >= 2
        )
        SELECT pr['a'] AS a, pr['b'] AS b,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs
        GROUP BY a, b
        ORDER BY n DESC, a ASC, b ASC
        LIMIT {COOC_TOPK}
    """,
    tags=("text", "agg", "topk"),
)
def text_cooc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a, b, n): the COOC_TOPK most frequent unordered term pairs
    within a +-COOC_WINDOW token window, ties broken lexicographically;
    ORDERED (n DESC, a, b) like every deterministic top-k here."""
    toks = table(spark, sf_dir, "documents").select(
        F.expr(
            "filter("
            + "split(lower(trim(text)), '\\\\s+')"
            + ", x -> x != '')"
        ).alias("t")
    )
    pairs = (
        toks.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    # the size(t) > d guard matters: Spark's
                    # sequence(1, 0) DESCENDS ([1, 0]) where DuckDB's
                    # range(1, 1) is empty
                    f"""
                    transform(
                        flatten(transform(sequence(1, {COOC_WINDOW}),
                            d -> if(size(t) > d,
                                 transform(sequence(1, size(t) - d),
                                     i -> array(element_at(t, i),
                                                element_at(t, i + d))),
                                 array()))),
                        p -> struct(least(p[0], p[1]) AS a,
                                    greatest(p[0], p[1]) AS b))
                    """
                )
            ).alias("pr")
        )
        .select("pr.a", "pr.b")
    )
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
        .limit(COOC_TOPK)
    )

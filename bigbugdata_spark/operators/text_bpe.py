"""Tokenizer-training pair statistics (round 8) — the first iteration
of byte-pair encoding: corpus-wide frequencies of adjacent character
pairs inside words, ranked. Training a BPE/WordPiece vocabulary over a
100 TB corpus starts exactly here, and the iteration's cost profile is
dominated by this counting step — the merge loop itself mutates a
driver-sized vocab.

No analog in the reference (SURVEY §2.1); text-analysis extension
surface alongside text_term_frequencies / text_vocab_approx.

Scale posture: the pair explosion runs over the AGGREGATED word vocab
(word, count), not the raw token stream — Heaps' law makes |vocab|
sublinear in corpus size, so the expensive explode touches millions of
rows where the corpus has trillions of tokens (the standard corpus-
frequency optimization in BPE trainers). Both the vocab and pair
aggregates are map-side combinable; the final rank sorts a frame
bounded by |charset|^2. Everything stays JVM-side (split / sequence /
transform / substr — no Python).

Determinism discipline: frequencies are exact BIGINT sums; the rank
orders by (freq DESC, pair ASC) so ties cannot reorder between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.registry import register

TOP_PAIRS = 20


@register(
    "text_bpe_pair_stats",
    oracle=f"""
        WITH words AS (
            SELECT unnest({H.sql_tokens('text')}) AS w FROM documents
        ),
        vocab AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS n
            FROM words WHERE length(w) >= 2 GROUP BY w
        ),
        pairs AS (
            SELECT unnest(list_transform(range(1, length(w)),
                          i -> substr(w, CAST(i AS INT), 2))) AS pair,
                   n
            FROM vocab
        ),
        agg AS (
            SELECT pair, CAST(SUM(n) AS BIGINT) AS freq
            FROM pairs GROUP BY pair
        ),
        ranked AS (
            SELECT pair, freq,
                   CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, pair)
                        AS BIGINT) AS rnk
            FROM agg
        )
        SELECT pair, freq, rnk FROM ranked WHERE rnk <= {TOP_PAIRS}
    """,
    tags=("text", "agg", "topk"),
)
def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K (K = TOP_PAIRS) adjacent character pairs inside words (the BPE
    merge candidates), with exact corpus frequency and a deterministic
    (freq DESC, pair ASC) rank.

    The pair explode is weighted by the word-vocab count — one explode
    per DISTINCT word, multiplied back by its corpus frequency — so the
    expensive step scales with vocabulary, not token volume."""
    docs = table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(H.tokens(F.col("text"))).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = vocab.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "n",
    )
    agg = pairs.groupBy("pair").agg(F.sum("n").alias("freq"))
    rnk = F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("pair")))
    return (
        agg.select("pair", "freq", rnk.cast("long").alias("rnk"))
        .where(F.col("rnk") <= TOP_PAIRS)
    )

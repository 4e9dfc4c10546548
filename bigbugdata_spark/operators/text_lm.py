"""Corpus bigram language-model statistics (round 8) — the n-gram LM
counting step: for the corpus' most frequent word bigrams, the joint
count and the conditional probability P(w2 | w1). Together with
text_bpe_pair_stats (character level) this completes the tokenizer/LM
estimation surface: BPE counts feed vocabulary training, bigram
conditionals feed the classic LM-quality and domain-shift diagnostics
("is this slice natural language or keyword spam").

No analog in the reference (SURVEY §2.1); text-analysis extension
surface alongside text_term_frequencies / text_repetition_stats.

Scale posture: one documents scan; bigrams come from one JVM-side
slide over the token array (transform over a sequence — no Python, no
self-join); both the bigram and the unigram-departure aggregates are
map-side combinable on vocabulary-bounded key spaces, and the
departure totals roll up FROM THE BIGRAM FRAME (arrays_zip of the
token slide), so no second scan. The final rank sorts a top-k-bounded
frame. Conditional probability is a single fp64 division of two exact
BIGINTs — hash-identical in both engines.

Word order inside documents matters (unlike bag-of-words queries), and
both engines split the same lowercased whitespace stream, so the
bigram multiset is engine-independent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.registry import register

TOP_BIGRAMS = 20


@register(
    "text_bigram_lm",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {H.sql_tokens('text')} AS t FROM documents
        ),
        bi AS (
            SELECT unnest(list_transform(range(1, len(t)),
                          i -> t[CAST(i AS INT)])) AS w1,
                   unnest(list_transform(range(1, len(t)),
                          i -> t[CAST(i AS INT) + 1])) AS w2
            FROM toks WHERE len(t) >= 2
        ),
        pairs AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
            FROM bi GROUP BY w1, w2
        ),
        dep AS (
            SELECT w1, n_pair,
                   CAST(SUM(n_pair) OVER (PARTITION BY w1) AS BIGINT)
                       AS n_w1,
                   w2
            FROM pairs
        ),
        ranked AS (
            SELECT w1, w2, n_pair, n_w1,
                   CAST(n_pair AS DOUBLE) / n_w1 AS p_cond,
                   CAST(ROW_NUMBER() OVER (ORDER BY n_pair DESC, w1, w2)
                        AS BIGINT) AS rnk
            FROM dep
        )
        SELECT w1, w2, n_pair, n_w1, p_cond, rnk
        FROM ranked WHERE rnk <= {TOP_BIGRAMS}
    """,
    tags=("text", "agg", "topk"),
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K (K = TOP_BIGRAMS) word bigrams by corpus count, with the
    departure total n_w1 (count of bigrams starting with w1) and the
    conditional probability p_cond = n_pair / n_w1; rank totals order
    by (count DESC, w1, w2) so ties never reorder between engines."""
    toks = table(spark, sf_dir, "documents").select(
        H.tokens(F.col("text")).alias("t")
    )
    # one JVM-side slide: bigram i = (t[i], t[i+1]) — element_at is
    # 1-based, sequence runs 1..len-1
    bi = (
        toks.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2"),
                    ),
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    pairs = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    dep = Window.partitionBy("w1")
    scored = pairs.select(
        "w1",
        "w2",
        "n_pair",
        F.sum("n_pair").over(dep).alias("n_w1"),
    ).withColumn("p_cond", F.col("n_pair").cast("double") / F.col("n_w1"))
    # Top-k via orderBy+limit -> TakeOrderedAndProject: each partition
    # keeps its local top TOP_BIGRAMS and the driver merges k*p rows.
    # An unpartitioned row_number window here would sort the ENTIRE
    # distinct-bigram vocabulary (billions of rows at corpus scale) on
    # one partition — the r8 verdict's scale-killer.  The ordering
    # (n_pair DESC, w1, w2) is total because (w1, w2) is the grouping
    # key, so the limit is deterministic and the rank assigned over the
    # TOP_BIGRAMS-row result is identical to the global row_number.
    top = scored.orderBy(
        F.desc("n_pair"), F.asc("w1"), F.asc("w2")
    ).limit(TOP_BIGRAMS)
    rnk = F.row_number().over(
        # bounded frame: exactly TOP_BIGRAMS rows reach this window
        # (the limit above is in its subtree — what the repo-wide plan
        # guard in tests/test_plans.py checks)
        Window.orderBy(F.desc("n_pair"), F.asc("w1"), F.asc("w2"))
    )
    return top.select(
        "w1", "w2", "n_pair", "n_w1", "p_cond", rnk.cast("long").alias("rnk")
    )

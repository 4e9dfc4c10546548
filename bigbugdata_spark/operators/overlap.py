"""Cross-document overlap diagnostics (round 6) — the two duplication
signals the dedup/text families did not yet cover as first-class
registered queries:

* per-document duplicated-span COVERAGE (`text_dup_span_coverage`) —
  how much of each document is made of long n-grams that also occur in
  other documents.  `text_dup_ngrams` reports the gram side of this
  (which grams recur corpus-wide); this query maps that duplication
  back onto documents, which is the number the RefinedWeb/FineWeb-style
  pipelines actually threshold when deciding to drop or trim a
  document.
* asymmetric CONTAINMENT pairs (`dedup_containment`) — |A ∩ B| /
  min(|A|, |B|) over shingle sets.  Jaccard (`dedup_ngram_jaccard`)
  is symmetric and misses the short-document-embedded-in-long-document
  case: a 100-gram doc fully contained in a 10 000-gram doc has
  J ≈ 0.01 but containment 1.0.  Quote pages, concatenated dumps and
  wrapper boilerplate around a copied article are exactly this shape.

No analog in the reference (a batch CSV tool, SURVEY §2.1); both are
LLM-pipeline extension surface over the driver's ``documents`` table,
with exact DuckDB oracle twins built from the same cross-engine hash
primitives as the dedup/text families (functions/hashing.py —
bit-identical by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.caching import pin
from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.registry import register

# Span-coverage gram length: 8 words, the decontamination-grade length —
# long enough that a cross-document repeat means copied text, not phrase
# coincidence (same constant family as text_dup_ngrams / _DECON_N).
_SPAN_N = 8

# Containment shingle length: word 3-grams, the same granularity as the
# Jaccard family so the two measures are directly comparable pair-wise.
_CONT_N = 3

# Containment threshold, applied as an integer cross-multiplication
# (10*c >= 9*min) so no floating-point comparison enters the oracle.
_CONT_NUM, _CONT_DEN = 9, 10


@register(
    "text_dup_span_coverage",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id, unnest(g) AS gram_hash FROM (
                SELECT doc_id,
                       {H.sql_shingle_hashes(H.sql_word_hashes(H.sql_tokens('text')), n=_SPAN_N, distinct=False)} AS g
                FROM documents
            )
        ),
        hot AS (
            SELECT gram_hash FROM grams
            GROUP BY gram_hash HAVING COUNT(DISTINCT doc_id) >= 2
        ),
        totals AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
            FROM grams GROUP BY doc_id
        ),
        dups AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_dup_grams,
                   CAST(COUNT(DISTINCT gram_hash) AS BIGINT) AS n_distinct_dup_grams
            FROM grams JOIN hot USING (gram_hash)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(t.n_grams, 0) AS n_grams,
               COALESCE(p.n_dup_grams, 0) AS n_dup_grams,
               COALESCE(p.n_distinct_dup_grams, 0) AS n_distinct_dup_grams
        FROM documents d
        LEFT JOIN totals t ON d.doc_id = t.doc_id
        LEFT JOIN dups p ON d.doc_id = p.doc_id
    """,
    tags=("text", "dedup", "agg", "headline"),
)
def text_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage — for every document, how
    many of its word-8-gram positions carry a gram that also occurs in
    at least one OTHER document, next to the document's total gram
    count.  n_dup_grams / n_grams is the fraction of the document made
    of corpus-duplicated text — the signal the trim-or-drop decision in
    a pre-training cleanup pass thresholds (raw integers are returned
    so the threshold stays policy, and so the cross-engine comparison
    is exact).  Documents shorter than 8 tokens have no grams and
    report zeros — kept, so the result covers the whole corpus.

    Distinct from text_dup_ngrams (the gram-side census: which grams
    recur, used to seed stop-gram caps): this is the document-side
    projection of the same duplication relation.  Within-document
    repeats do NOT count — the hot set requires >= 2 distinct doc_ids,
    so a chorus repeated inside one song is text_repetition_stats'
    business, not this query's.

    Plan: one explode; the hot-gram set is a hash-agg on the gram key
    (count-distinct over doc_id with map-side partials); mapping it
    back is an equi-join on the gram hash — grams joined against a
    corpus-fraction-sized key set, shuffle-partitioned on the same key
    the agg just used.  Per-doc roll-up + one broadcast-able left join
    to restore zero-gram docs.  No pair expansion anywhere: cost is
    O(total grams), not O(pairs) — this runs where Jaccard would blow
    up, which is the point of running it first at 100 TB."""
    docs = table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            H.shingle_hashes(
                H.word_hashes(H.tokens(F.col("text"))),
                n=_SPAN_N,
                distinct=False,
            )
        ).alias("gram_hash"),
    )
    # r17 restructure (guide §2.4): pin the per-(doc, gram) occurrence
    # counts, partitioned by the gram hash, instead of the raw exploded
    # gram stream. One row per (doc, gram) means the per-gram distinct
    # document count is a plain COUNT over the gram's partition — an
    # in-partition window, no hot-set join, no countDistinct Expand —
    # and both roll-ups shuffle per-(doc, gram) rows, not raw gram
    # positions. The repartition BEFORE the aggregate puts the single
    # full-size exchange into the cache build: the cached frame keeps
    # hashpartitioning(gram_hash), so the window needs no exchange at
    # all, and the doc_id roll-ups exchange only post-partial-agg rows.
    # (Old shape: 5 gram-scale exchange passes behind the cache —
    # measured 0.61 -> 0.50 s min at sf0.1, result symdiff 0.)
    pg = pin(
        grams.repartition("gram_hash")
        .groupBy("doc_id", "gram_hash")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    nd = F.count(F.lit(1)).over(Window.partitionBy("gram_hash"))
    totals = pg.groupBy("doc_id").agg(F.sum("cnt").alias("n_grams"))
    dups = (
        pg.withColumn("nd", nd)
        .filter(F.col("nd") >= 2)
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_dup_grams"),
            F.count(F.lit(1)).alias("n_distinct_dup_grams"),
        )
    )
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(dups, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.coalesce("n_distinct_dup_grams", F.lit(0)).alias(
                "n_distinct_dup_grams"
            ),
        )
    )


@register(
    "dedup_containment",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id, unnest(g) AS g FROM (
                SELECT doc_id,
                       {H.sql_shingle_hashes(H.sql_word_hashes(H.sql_tokens('text')), n=_CONT_N, distinct=True)} AS g
                FROM documents
            )
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
            FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY d1, d2
        )
        SELECT d1, d2,
               CAST(c AS BIGINT) AS n_shared,
               CAST(s1.sz AS BIGINT) AS sz1,
               CAST(s2.sz AS BIGINT) AS sz2
        FROM common
        JOIN sizes s1 ON s1.doc_id = d1
        JOIN sizes s2 ON s2.doc_id = d2
        WHERE {_CONT_DEN}*c >= {_CONT_NUM}*LEAST(s1.sz, s2.sz)
    """,
    tags=("dedup", "join"),
)
def dedup_containment(
    spark: SparkSession, sf_dir: str, max_gram_df: int | None = None
) -> DataFrame:
    """Asymmetric containment pairs: document pairs where the smaller
    shingle set is >= 90% contained in the overlap, i.e.
    |A ∩ B| / min(|A|, |B|) >= 0.9 over distinct word-3-gram sets.
    Catches the doc-inside-doc duplication Jaccard is structurally
    blind to (a short article embedded in a long concatenated page has
    J ~ |A|/|B| -> 0 but containment 1.0).  The threshold is applied as
    an integer cross-multiplication and the raw set sizes are returned,
    so both engines compare exact BIGINTs end-to-end.

    Plan: the dedup_ngram_jaccard skeleton — explode distinct shingles,
    inverted-index self-equi-join on the shingle hash (never an
    all-pairs crossJoin), per-pair overlap count, then two id-equi
    joins against the per-doc size aggregate.  `max_gram_df` is the
    same stop-gram skew valve (drop grams whose document frequency
    exceeds the cap from both join sides; sizes stay pre-cap, so
    reported containment only ever UNDER-estimates — the conservative
    direction).  The registered form is cap-free and oracle-exact; the
    hot-gram bound is proven on a synthetic corpus by
    tests/test_extensions.py for the shared skeleton."""
    docs = table(spark, sf_dir, "documents")
    grams = pin(
        docs.select(
            "doc_id",
            F.explode(
                H.shingle_hashes(
                    H.word_hashes(H.tokens(F.col("text"))),
                    n=_CONT_N,
                    distinct=True,
                )
            ).alias("g"),
        )
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    joinable = grams
    if max_gram_df is not None:
        keep = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("gram_df"))
            .filter(F.col("gram_df") <= max_gram_df)
            .select("g")
        )
        joinable = grams.join(keep, "g")
    # shuffle_hash: same rationale (and measured class) as
    # dedup_ngram_jaccard — the join's sort order is discarded by the
    # (d1, d2) regroup, so the SMJ sorts are pure overhead
    a, b = joinable.hint("shuffle_hash").alias("a"), joinable.alias("b")
    common = (
        a.join(
            b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id"))
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("sz2"))
    return (
        common.join(s1, "d1")
        .join(s2, "d2")
        .filter(
            F.lit(_CONT_DEN) * F.col("c")
            >= F.lit(_CONT_NUM) * F.least("sz1", "sz2")
        )
        .select(
            "d1",
            "d2",
            F.col("c").alias("n_shared"),
            "sz1",
            "sz2",
        )
    )

"""Text round-3 additions — sketch-based scale twins (see
operators/events_ext.py for the registration-order rationale; rows-only
checks with error-bound tests against exact baselines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.registry import register

HLL_RSD = 0.01  # HyperLogLog++ target relative standard deviation


@register("text_vocab_approx", tags=("text", "agg"))
def text_vocab_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics with HyperLogLog++ distinct counts —
    the 100 TB twin of text_token_stats: exact COUNT(DISTINCT term) plans
    an Expand (one input row per distinct aggregate) plus a shuffle of
    every distinct (lang, term) pair, while HLL++ is a fixed-size (~
    kilobytes at rsd=0.01) mergeable register set per group — map-side
    partial agg, one shuffle of sketches, no expand.

    Rows-only by design: HLL register contents are engine-specific. The
    error contract (|approx - exact| / exact within a few rsd for both
    distinct columns) is asserted against text_token_stats in
    tests/test_extensions.py."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(H.tokens(F.col("text"))).alias("term")
    )
    return toks.groupBy("lang").agg(
        F.approx_count_distinct("doc_id", HLL_RSD).alias("n_docs_approx"),
        F.count(F.lit(1)).alias("total_tokens"),
        F.approx_count_distinct("term", HLL_RSD).alias("distinct_terms_approx"),
    )


# BM25 constants: k1/b are the standard defaults; the idf is the
# rational Robertson form WITHOUT the log so both engines compute it as
# a ratio of exact integers (the log is monotone, so ranking order is
# unchanged; the substitution is documented in the docstring).
_BM25_TERMS = ("spark", "join", "window")
_BM25_TERMS_SQL = "('spark', 'join', 'window')"


@register(
    "text_bm25_rank",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({H.sql_tokens('text')}) AS term
            FROM documents
        ), dl AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
            FROM toks GROUP BY doc_id
        ), corpus AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(dl) AS BIGINT) AS total_tokens
            FROM dl
        ), tf AS (
            SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks WHERE term IN {_BM25_TERMS_SQL}
            GROUP BY term, doc_id
        ), dfreq AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df
            FROM tf GROUP BY term
        )
        SELECT term, doc_id, tf, dl,
               (CAST(2*n_docs - 2*df + 1 AS DOUBLE)
                  / CAST(2*df + 1 AS DOUBLE))
               * ((CAST(tf AS DOUBLE) * 2.2)
                  / (CAST(tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
                         / (CAST(total_tokens AS DOUBLE)
                            / CAST(n_docs AS DOUBLE))))))
                   AS bm25_score
        FROM tf
        JOIN dl USING (doc_id)
        CROSS JOIN corpus
        JOIN dfreq USING (term)
    """,
    tags=("text", "join", "agg"),
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against a fixed query-term set —
    the classic search-scoring operator over the documents table
    (k1=1.2, b=0.75). The idf uses the rational Robertson form
    (2N-2df+1)/(2df+1) INSTEAD of its logarithm: log differs in final
    ulps across math libraries, while the rational form is a ratio of
    exact integers — bit-identical cross-engine and monotone in the
    same direction, so ranking order is preserved.

    Every input to the score is an exact integer (tf, dl, df, N, token
    totals); the score expression is the same parenthesized tree on both
    engines, so fp64 evaluation is bit-identical.

    Plan: one explode feeds BOTH aggregates (per-doc length and
    term-filtered tf); the term filter cuts the tf shuffle to the query
    vocabulary; df and the one-row corpus stats broadcast back; the only
    full-corpus shuffle is the per-doc length agg (map-side combinable)."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(H.tokens(F.col("text"))).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")
    idf = (2 * F.col("n_docs") - 2 * F.col("df") + 1).cast("double") / (
        2 * F.col("df") + 1
    ).cast("double")
    tf_d = F.col("tf").cast("double")
    score = idf * (
        (tf_d * F.lit(2.2))
        / (tf_d + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * (F.col("dl").cast("double") / avgdl)))
    )
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(corpus))
        .join(F.broadcast(dfreq), "term")
        .select("term", "doc_id", "tf", "dl", score.alias("bm25_score"))
    )


# Per-language keep quotas in permille — the "data mixing" knob: a
# training corpus rarely takes every language at its natural rate.
_MIX_PERMILLE = {"en": 800, "de": 500, "fr": 250, "es": 125, "zh": 60}
_MIX_A, _MIX_B = 48_271, 11_213  # fixed affine-hash parameters, mod P


@register(
    "corpus_mix_sample",
    oracle=f"""
        WITH quota(lang, permille) AS (
            VALUES {", ".join(f"('{lang}', {pm})" for lang, pm in sorted(_MIX_PERMILLE.items()))}
        )
        SELECT doc_id, documents.lang AS lang, source, permille
        FROM documents
        JOIN quota ON documents.lang = quota.lang
        WHERE ({_MIX_A} * doc_id + {_MIX_B}) % {H.P} % 1000 < permille
    """,
    tags=("text", "sample"),
)
def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language quota downsampling — the corpus-mixing
    operator: each language keeps its configured permille of documents,
    selected by an affine hash of doc_id (NOT df.sample(): rng-based
    sampling is engine- and partitioning-dependent, while the hash
    condition is a pure row predicate — reproducible across engines,
    re-runs and repartitions, and stable under incremental ingest: a doc
    kept today is kept tomorrow).

    Plan: broadcast the 5-row quota table into one corpus scan; the keep
    predicate is a scan-side filter — no shuffle at all. At 100 TB the
    same predicate runs inside the scan of each partition and composes
    with partition pruning on lang-partitioned layouts
    (sources/jsonl.write_corpus_partitioned)."""
    quota = spark.createDataFrame(
        sorted(_MIX_PERMILLE.items()), "lang string, permille int"
    )
    keep = (
        (F.lit(_MIX_A) * F.col("doc_id") + F.lit(_MIX_B)) % F.lit(H.P) % 1000
        < F.col("permille")
    )
    return (
        table(spark, sf_dir, "documents")
        .join(F.broadcast(quota), "lang")
        .filter(keep)
        .select("doc_id", "lang", "source", "permille")
    )

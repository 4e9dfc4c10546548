"""Corpus-governance operators (round 5): the two training-data pipeline
stages the engine did not yet cover as first-class registered queries —
benchmark decontamination and deterministic dataset splitting. No analog
in the reference (strictly a batch CSV tool, SURVEY §2.1); both are
LLM-pipeline extension surface per the north star, over the driver's
``documents`` table with exact DuckDB oracle twins built from the same
cross-engine hash primitives as the dedup/text families
(functions/hashing.py — bit-identical by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.registry import register

# The held-out "benchmark" slice: a deterministic doc_id residue class
# stands in for an eval set (at a real site this is the actual benchmark
# corpus loaded from its own table). mod 7 (~14%) is the smallest residue
# class whose gram overlap with the synthetic corpus is non-trivial at
# the driver's sf0.01 gate — a zero-row result would make the driver's
# hash verdict vacuous.
_BENCH_MOD = 7

# Decontamination gram length: long enough that a shared gram means real
# contamination, not phrase coincidence (industry practice uses 8-13).
_DECON_N = 8

# Stratified-split affine hash (distinct parameters from corpus_mix's so
# the two assignments are independent); permille cut points.
_SPLIT_A, _SPLIT_B = 69_621, 32_027
_TRAIN_PM, _VAL_PM = 980, 990  # <980 train, <990 val, else test


@register(
    "text_decontaminate",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id, unnest(g) AS gram_hash FROM (
                SELECT doc_id,
                       {H.sql_shingle_hashes(H.sql_word_hashes(H.sql_tokens('text')), n=_DECON_N, distinct=True)} AS g
                FROM documents
            )
        ),
        bench AS (
            SELECT doc_id AS bench_id, gram_hash FROM grams
            WHERE doc_id % {_BENCH_MOD} = 0
        ),
        corpus AS (
            SELECT doc_id, gram_hash FROM grams
            WHERE doc_id % {_BENCH_MOD} <> 0
        )
        SELECT corpus.doc_id AS doc_id,
               CAST(COUNT(DISTINCT corpus.gram_hash) AS BIGINT) AS n_shared_grams,
               CAST(COUNT(DISTINCT bench.bench_id) AS BIGINT) AS n_bench_docs
        FROM corpus JOIN bench USING (gram_hash)
        GROUP BY corpus.doc_id
    """,
    tags=("text", "join", "agg", "headline"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — flag training documents that share any
    word-{n}-gram with the held-out benchmark slice, with the distinct
    shared-gram and touched-benchmark-document counts that drive the
    drop/keep decision. The standard pre-training hygiene pass (long
    verbatim n-gram overlap with eval sets).

    Plan: one explode produces distinct gram hashes per document; the
    benchmark side broadcasts into the corpus gram stream — candidate
    generation is a keyed equi-join on the gram hash, never any
    all-pairs comparison — and one shuffle aggregates per flagged
    corpus document. The broadcast is justified by what a benchmark IS:
    a fixed eval set of thousands of documents against a corpus of
    billions — small intrinsically, not proportionally (the doc_id
    residue class here only stands in for that fixed set at test
    scale). For corpus-vs-corpus overlap, where neither side is small,
    the right tool is the shuffled inverted-index join of
    dedup_ngram_jaccard / text_dup_ngrams instead. Fan-out per corpus
    gram is bounded by the benchmark's occurrence count of that gram
    (benchmark-sized, not corpus-sized)."""
    grams = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            H.shingle_hashes(
                H.word_hashes(H.tokens(F.col("text"))), n=_DECON_N, distinct=True
            )
        ).alias("gram_hash"),
    )
    bench = grams.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "gram_hash"
    )
    corpus = grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return (
        corpus.join(F.broadcast(bench), "gram_hash")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram_hash").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


text_decontaminate.__doc__ = text_decontaminate.__doc__.format(n=_DECON_N)


@register(
    "corpus_split_stratified",
    oracle=f"""
        SELECT lang,
               CASE WHEN h < {_TRAIN_PM} THEN 'train'
                    WHEN h < {_VAL_PM} THEN 'val'
                    ELSE 'test' END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(text)) AS BIGINT) AS total_chars
        FROM (
            SELECT lang, text,
                   ({_SPLIT_A} * doc_id + {_SPLIT_B}) % {H.P} % 1000 AS h
            FROM documents
        )
        GROUP BY lang, split
    """,
    tags=("text", "sample", "agg", "headline"),
)
def corpus_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split accounting, stratified by
    language: every document is assigned by an affine hash of doc_id
    (98.0/1.0/1.0 permille cut points), and the query reports per
    (lang, split) document and character totals — the dataset-card
    numbers for a training corpus.

    Hash assignment, not df.randomSplit(): the rng form is partitioning-
    dependent and unstable under re-runs and incremental ingest, while
    the hash is a pure row predicate — a document's split NEVER changes
    as the corpus grows, which is what keeps eval sets uncontaminated
    across dataset versions (same rationale as corpus_mix_sample, with
    independent hash parameters so mixing and splitting don't correlate).

    Plan: split assignment is a scan-side expression (no shuffle, no
    join); ONE map-side-combinable aggregate on the bounded
    (lang x split) key space. At 100 TB this is a single pass."""
    h = (F.lit(_SPLIT_A) * F.col("doc_id") + F.lit(_SPLIT_B)) % F.lit(H.P) % 1000
    split = (
        F.when(h < _TRAIN_PM, "train").when(h < _VAL_PM, "val").otherwise("test")
    )
    return (
        table(spark, sf_dir, "documents")
        .select("lang", split.alias("split"), F.length("text").alias("_len"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_len").alias("total_chars"),
        )
    )


# Repetition gram length: word bigrams — the shortest gram whose
# repetition rate separates boilerplate/spam from prose.
_REP_N = 2


@register(
    "text_repetition_stats",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id, unnest(g) AS gram_hash FROM (
                SELECT doc_id,
                       {H.sql_shingle_hashes(H.sql_word_hashes(H.sql_tokens('text')), n=_REP_N, distinct=False)} AS g
                FROM documents
            )
        ),
        cnt AS (
            SELECT doc_id, gram_hash, CAST(COUNT(*) AS BIGINT) AS c
            FROM grams GROUP BY doc_id, gram_hash
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_bigrams,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
               CAST(MAX(c) AS BIGINT) AS max_bigram_count
        FROM cnt GROUP BY doc_id
    """,
    tags=("text", "agg", "headline"),
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition profile — the Gopher-style quality
    signal that catches boilerplate and generated spam: per document,
    total word-bigram occurrences, distinct bigrams, and the hottest
    bigram's count. Downstream filters threshold the ratios
    (max/total high, distinct/total low => repetitive junk); the raw
    integers are returned so the thresholds stay policy, not plumbing —
    and so the cross-engine comparison is exact.

    Plan: one explode, then a two-level aggregate ((doc, gram) counts,
    then per-doc roll-up). Both levels combine map-side; the second
    grouping is a prefix of the first, so under hash partitioning on
    doc_id+gram the roll-up needs no second exchange of raw rows."""
    grams = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            H.shingle_hashes(
                H.word_hashes(H.tokens(F.col("text"))), n=_REP_N, distinct=False
            )
        ).alias("gram_hash"),
    )
    cnt = grams.groupBy("doc_id", "gram_hash").agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct_bigrams"),
        F.max("c").alias("max_bigram_count"),
    )


@register(
    "pipe_governed_corpus",
    oracle=f"""
        WITH grams AS (
            SELECT doc_id, unnest(g) AS gram_hash FROM (
                SELECT doc_id,
                       {H.sql_shingle_hashes(H.sql_word_hashes(H.sql_tokens('text')), n=_REP_N, distinct=False)} AS g
                FROM documents
            )
        ),
        cnt AS (
            SELECT doc_id, gram_hash, CAST(COUNT(*) AS BIGINT) AS c
            FROM grams GROUP BY doc_id, gram_hash
        ),
        rep_bad AS (
            SELECT doc_id FROM cnt GROUP BY doc_id
            HAVING 5 * MAX(c) > SUM(c)
        ),
        dgrams AS (
            SELECT doc_id, unnest(g) AS gram_hash FROM (
                SELECT doc_id,
                       {H.sql_shingle_hashes(H.sql_word_hashes(H.sql_tokens('text')), n=_DECON_N, distinct=True)} AS g
                FROM documents
            )
        ),
        contaminated AS (
            SELECT DISTINCT c.doc_id
            FROM dgrams c JOIN dgrams b USING (gram_hash)
            WHERE c.doc_id % {_BENCH_MOD} <> 0 AND b.doc_id % {_BENCH_MOD} = 0
        )
        SELECT lang,
               CASE WHEN h < {_TRAIN_PM} THEN 'train'
                    WHEN h < {_VAL_PM} THEN 'val'
                    ELSE 'test' END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(text)) AS BIGINT) AS total_chars
        FROM (
            SELECT doc_id, lang, text,
                   ({_SPLIT_A} * doc_id + {_SPLIT_B}) % {H.P} % 1000 AS h
            FROM documents
            WHERE doc_id % {_BENCH_MOD} <> 0
              AND doc_id NOT IN (SELECT doc_id FROM rep_bad)
              AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        )
        GROUP BY lang, split
    """,
    tags=("text", "pipeline"),
)
def pipe_governed_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 governance stages COMPOSED into one lazy plan — what a
    real pre-training data build runs: drop the held-out benchmark
    slice, gate out repetitive documents (hottest bigram > 20% of all
    bigrams — integer cross-multiplication, no fp threshold), drop
    documents contaminated by benchmark n-gram overlap, then account
    the survivors per (lang, split). Documents too short to have a
    bigram cannot be repetitive and are kept.

    Plan: the two gates are anti-joins against aggregate-derived key
    sets (flagged-docs frames are corpus-fraction-sized, not
    corpus-sized); everything composes lazily so Catalyst prunes the
    documents scan to the consumed columns once per branch. The same
    boundedness arguments as the standalone operators apply."""
    docs = table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            H.shingle_hashes(
                H.word_hashes(H.tokens(F.col("text"))), n=_REP_N, distinct=False
            )
        ).alias("gram_hash"),
    )
    cnt = grams.groupBy("doc_id", "gram_hash").agg(F.count(F.lit(1)).alias("c"))
    rep_bad = (
        cnt.groupBy("doc_id")
        .agg(F.max("c").alias("m"), F.sum("c").alias("t"))
        .filter(5 * F.col("m") > F.col("t"))
        .select("doc_id")
    )
    dgrams = docs.select(
        "doc_id",
        F.explode(
            H.shingle_hashes(
                H.word_hashes(H.tokens(F.col("text"))), n=_DECON_N, distinct=True
            )
        ).alias("gram_hash"),
    )
    bench = dgrams.filter(F.col("doc_id") % _BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "gram_hash"
    )
    contaminated = (
        dgrams.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .join(F.broadcast(bench.select("gram_hash")), "gram_hash")
        .select("doc_id")
        .distinct()
    )
    h = (F.lit(_SPLIT_A) * F.col("doc_id") + F.lit(_SPLIT_B)) % F.lit(H.P) % 1000
    split = (
        F.when(h < _TRAIN_PM, "train").when(h < _VAL_PM, "val").otherwise("test")
    )
    clean = (
        docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .join(rep_bad, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
    )
    return (
        clean.select("lang", split.alias("split"), F.length("text").alias("_len"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_len").alias("total_chars"),
        )
    )

"""Benchmark decontamination — split out of operators/corpus.py for the
r18 rotation (VERDICT r17 #3: the r18 oracle cap must hold the queries
round 17 restructured; corpus' other four registrations are untouched
with r13-fresh family verdicts).  Moved VERBATIM: same name, same fn
body, same oracle.  corpus.py re-imports the shared helpers
(_decon_grams / _load_benchmark / _BENCH_MOD / _DECON_N) because
pipe_governed_corpus composes the same gram pipeline.  Same split
pattern as events_quant (r12) / events_retention / tpch_hot (r18).
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
def text_decontaminate(
    spark: SparkSession,
    sf_dir: str,
    benchmark: "DataFrame | str | None" = None,
    preagg: bool = False,
) -> DataFrame:
    """Benchmark decontamination — flag training documents that share any
    word-{n}-gram with the benchmark, with the distinct shared-gram and
    touched-benchmark-document counts that drive the drop/keep decision.
    The standard pre-training hygiene pass (long verbatim n-gram overlap
    with eval sets).

    `benchmark` selects the eval-set source:
      * None (the registered/oracle form): the deterministic doc_id
        residue class stands in for an eval set, and the corpus side
        excludes it;
      * a DataFrame with (doc_id, text) columns, or a parquet path to
        one: the REAL fixed-size benchmark corpus — grams are derived
        from it with the same shingle pipeline, and the whole documents
        table is the corpus side. This is the production shape: the
        broadcast is sized by the external eval set, which is small
        intrinsically, not corpus-proportionally.

    `preagg` selects the join shape (r18 decision, VERDICT r17 #6):
      * False (registered default, the measured winner): broadcast the
        (gram_hash, bench_id) rows and let the two COUNT(DISTINCT)s
        aggregate the fan-out. The r17 pre-aggregate form measured
        10-20% SLOWER in both r17 driver runs at sf0.1 and again in the
        r18 interleaved A/B at sf0.1 (-16/-19%) and x10 (-4/-15%)
        (plans/r18/decontam_ab.json) — the Expand x2 it removed is
        cheaper here than its collect_set build + per-row set-union
        work, so the "strictly better plan" never beat the simple one
        at any measurable scale and the round rule (keep only if not
        worse) reverts it.
      * True (kept for extreme bench-side fan-out): the benchmark side
        pre-aggregated to ONE row per gram carrying its distinct
        bench-doc set, making the broadcast join 1:1 against the corpus
        gram stream — no per-(gram, bench_doc) row multiplication, no
        Expand. Worth switching only when benchmark documents overlap
        each other so heavily that the per-gram fan-out multiplier (the
        old shape's joined-row count over the new one's) is large;
        measured on this corpus it is exactly 1.0 (2386 joined rows
        either way — no gram is shared by two bench docs), so there is
        nothing for the pre-aggregate to win back.

    For corpus-vs-corpus overlap, where neither side is small, the
    right tool is the shuffled inverted-index join of
    dedup_ngram_jaccard / text_dup_ngrams instead."""
    grams = _decon_grams(table(spark, sf_dir, "documents"))
    bench_docs = _load_benchmark(spark, benchmark)
    if bench_docs is None:
        bench = grams.filter(F.col("doc_id") % _BENCH_MOD == 0)
        corpus = grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
    else:
        bench = _decon_grams(bench_docs)
        corpus = grams
    if preagg:
        per_gram = bench.groupBy("gram_hash").agg(
            F.collect_set("doc_id").alias("bids")
        )
        return (
            corpus.join(F.broadcast(per_gram), "gram_hash")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_shared_grams"),
                F.size(F.array_distinct(F.flatten(F.collect_list("bids"))))
                .cast("long")
                .alias("n_bench_docs"),
            )
        )
    bench_rows = bench.select(F.col("doc_id").alias("bench_id"), "gram_hash")
    return (
        corpus.join(F.broadcast(bench_rows), "gram_hash")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram_hash").cast("long").alias("n_shared_grams"),
            F.countDistinct("bench_id").cast("long").alias("n_bench_docs"),
        )
    )


def _decon_grams(docs: DataFrame) -> DataFrame:
    """(doc_id, gram_hash): distinct decontamination n-grams per doc."""
    return docs.select(
        "doc_id",
        F.explode(
            H.shingle_hashes(
                H.word_hashes(H.tokens(F.col("text"))), n=_DECON_N, distinct=True
            )
        ).alias("gram_hash"),
    )


def _load_benchmark(
    spark: SparkSession, benchmark: "DataFrame | str | None"
) -> "DataFrame | None":
    """Resolve the external benchmark corpus: None passes through (the
    residue-class stand-in), a path reads parquet, a DataFrame is used
    as-is. Contract: (doc_id, text) columns."""
    if benchmark is None:
        return None
    if isinstance(benchmark, str):
        benchmark = spark.read.parquet(benchmark)
    return benchmark.select("doc_id", "text")


text_decontaminate.__doc__ = text_decontaminate.__doc__.format(n=_DECON_N)

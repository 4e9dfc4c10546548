"""Sequence-packing accounting (round 6) — the planning pass behind
LLM training-batch assembly: documents are concatenated in a stable
order and split into fixed token-budget sequences ("packs"), and the
query reports, per pack, how many documents it touches and how many
arrive split across a pack boundary. Those are the numbers a data
engineer tunes the budget against (boundary splits truncate context;
the last pack's fill measures padding waste). No analog in the
reference (SURVEY §2.1 — no token concept at all).

Model: the GPT-style concat-and-split discipline — token stream =
documents in doc_id order, pack k owns token offsets
[k*BUDGET, (k+1)*BUDGET). Document-atomic first-fit needs a
sequential reset-on-overflow accumulator (not window-expressible and
not parallel); concat-and-split is what large pipelines actually run
BECAUSE it is a pure prefix-sum — embarrassingly parallel and
deterministic under ingest growth within a bucket.

Scale posture: documents are first salted into independent PACKING
BUCKETS by an affine doc_id hash (distinct parameters from the
mix/split hashes), so the cumulative sum — the only order-dependent
step — runs per bucket: each bucket is one window partition, and the
bucket count is the parallelism knob (at 100 TB, thousands of buckets
=> thousands of independent prefix sums; the cross-bucket layout costs
nothing because packs never span buckets). One explode maps documents
onto the packs they overlap (fan-out = packs per doc, bounded by
doc_len/BUDGET + 1), then one bounded aggregate per (bucket, pack).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.registry import register

PACK_BUDGET = 512  # tokens per training sequence
N_BUCKETS = 8  # independent packing streams (the parallelism knob)
_PACK_A, _PACK_B = 75_193, 40_009  # bucket hash (distinct from mix/split)


@register(
    "corpus_pack_accounting",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   ({_PACK_A} * doc_id + {_PACK_B}) % {H.P} % {N_BUCKETS}
                       AS bucket,
                   CAST(len({H.sql_tokens('text')}) AS BIGINT) AS n
            FROM documents
        ),
        offs AS (
            SELECT doc_id, bucket, n,
                   CAST(SUM(n) OVER (
                       PARTITION BY bucket ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n AS BIGINT) AS start_off
            FROM toks
        ),
        spans AS (
            SELECT bucket, doc_id, n, start_off,
                   unnest(range(start_off // {PACK_BUDGET},
                                (start_off + n - 1) // {PACK_BUDGET} + 1))
                       AS pack_id
            FROM offs WHERE n > 0
        )
        SELECT bucket, CAST(pack_id AS BIGINT) AS pack_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN start_off < pack_id * {PACK_BUDGET}
                               OR start_off + n > (pack_id + 1) * {PACK_BUDGET}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs,
               CAST(SUM(LEAST(start_off + n, (pack_id + 1) * {PACK_BUDGET})
                      - GREATEST(start_off, pack_id * {PACK_BUDGET}))
                    AS BIGINT) AS n_tokens
        FROM spans
        GROUP BY bucket, pack_id
    """,
    tags=("corpus", "window", "agg"),
)
def corpus_pack_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (bucket, pack): documents touched, documents split across a
    pack boundary, and the pack's token count (== BUDGET except each
    bucket's final pack, whose fill is the padding-waste signal).
    Integers end-to-end — token counts, prefix sums, interval clips —
    so the oracle comparison is exact.

    Plan: one scan computes token counts; ONE window prefix-sum per
    bucket (the deliberate partitioning: doc_id order within an
    affine-hash bucket, so the sequential dependency never exceeds a
    bucket); sequence+explode maps each document onto the packs its
    token interval overlaps; one map-side-combinable aggregate on the
    bounded (bucket, pack) key space."""
    bucket = (F.lit(_PACK_A) * F.col("doc_id") + F.lit(_PACK_B)) % F.lit(H.P) % F.lit(
        N_BUCKETS
    )
    toks = table(spark, sf_dir, "documents").select(
        "doc_id",
        bucket.alias("bucket"),
        F.size(H.tokens(F.col("text"))).cast("long").alias("n"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = toks.withColumn("start_off", F.sum("n").over(w) - F.col("n"))
    spans = offs.filter(F.col("n") > 0).select(
        "bucket",
        "doc_id",
        "n",
        "start_off",
        F.explode(
            F.sequence(
                F.floor(F.col("start_off") / PACK_BUDGET),
                F.floor((F.col("start_off") + F.col("n") - 1) / PACK_BUDGET),
            )
        ).alias("pack_id"),
    )
    lo = F.col("pack_id") * PACK_BUDGET
    hi = (F.col("pack_id") + 1) * PACK_BUDGET
    split = (F.col("start_off") < lo) | (F.col("start_off") + F.col("n") > hi)
    return (
        spans.groupBy("bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(split.cast("long")).alias("n_split_docs"),
            F.sum(
                F.least(F.col("start_off") + F.col("n"), hi)
                - F.greatest(F.col("start_off"), lo)
            ).alias("n_tokens"),
        )
    )

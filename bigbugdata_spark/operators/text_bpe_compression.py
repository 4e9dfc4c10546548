"""BPE compression roll-up — split out of operators/text_bpe_train.py
for the r18 rotation (the trainer query holds the cap slot; this
roll-up runs the identical text_bpe_core trainer and inherits every
core change, so its coverage rides the trainer's verdict plus the unit
suite).  Moved VERBATIM: same name, same fn body, same oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.operators.text_bpe_core import (
    BPE_STEPS,
    SEP_EXPR as _SEP_EXPR,
    SEP_SQL as _SEP_SQL,
    TRAIN_CTES as _TRAIN_CTES,
    train as _train,
)
from bigbugdata_spark.registry import register

_COMPRESSION_ORACLE_SQL = (
    _TRAIN_CTES
    + f"""SELECT
        CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(freq) AS BIGINT) AS n_tokens,
        CAST(SUM(freq * length(word)) AS BIGINT) AS base_symbols,
        CAST(SUM(freq * len(list_filter(string_split(s, {_SEP_SQL}),
                                        x -> x != ''))) AS BIGINT)
            AS merged_symbols,
        CAST(CAST((SUM(freq * length(word))
              - SUM(freq * len(list_filter(string_split(s, {_SEP_SQL}),
                                           x -> x != '')))) * 1000
             AS BIGINT) // SUM(freq * length(word)) AS BIGINT) AS saved_pm
    FROM v{BPE_STEPS}
    """
)


@register(
    "text_bpe_compression",
    oracle=_COMPRESSION_ORACLE_SQL,
    tags=("text", "iterative", "agg"),
)
def text_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the learned merges BUY, measured on the training corpus:
    distinct words, corpus token occurrences, symbol count before any
    merge (= character count) and after BPE_STEPS merges, and the
    integer-permille symbol saving.  Runs the identical training loop
    and aggregates the FINAL vocabulary state — the oracle reuses the
    trainer's unrolled rounds and aggregates its last-round vocabulary
    CTE, so the applied merges (not just the chosen pairs) are
    hash-gated corpus-wide."""
    vocab, _ = _train(spark, sf_dir)
    n_syms = F.size(F.expr(f"filter(split(s, {_SEP_EXPR}), x -> x != '')"))
    return vocab.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("freq").alias("n_tokens"),
        F.sum(F.col("freq") * F.length("word")).alias("base_symbols"),
        F.sum(F.col("freq") * n_syms).alias("merged_symbols"),
        (
            (
                F.sum(F.col("freq") * F.length("word"))
                - F.sum(F.col("freq") * n_syms)
            )
            * 1000
        )
        .cast("long")
        .alias("_num"),
    ).select(
        "n_words",
        "n_tokens",
        "base_symbols",
        "merged_symbols",
        F.expr("_num div base_symbols").alias("saved_pm"),
    )

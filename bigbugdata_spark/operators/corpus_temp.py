"""Temperature-based source mixing (round 12) — the availability-
derived counterpart of corpus_epoch_mix_plan's explicit target mix:
when no hand-set mix exists, multilingual/multi-source pretraining
upsamples small sources by flattening the natural distribution,
weight ∝ n_tokens^T with temperature T < 1 (the mBERT/XLM-R exponent
recipe).  T = 1/2 here, computed EXACTLY: weight = floor(sqrt(n))
via the engines' correctly-rounded IEEE sqrt on BIGINT-exact inputs
(the scaled_ivf_k precedent — bit-identical in Spark and DuckDB for
n < 2^53), and every downstream share/allocation/epoch figure is
truncating BIGINT arithmetic.  The budget is one corpus-worth of
tokens, so the plan is a pure REDISTRIBUTION: epochs_milli > 1000
means the source is oversampled (epochs beyond one pass), < 1000
subsampled — the number the data-constrained-scaling review reads.

No analog in the reference (SURVEY §2.1); corpus-governance extension
surface.

Scale posture: one documents scan -> per-source token aggregate
(map-side combinable, |sources| rows); everything after is integer
arithmetic on that panel with one panel-sized window for the weight
total — never a corpus-sized second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.registry import register

_TEMP_ORACLE_SQL = f"""
    WITH per_source AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({H.sql_tokens('text')})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    weighted AS (
        SELECT *,
               CAST(FLOOR(SQRT(n_tokens)) AS BIGINT) AS weight,
               SUM(CAST(FLOOR(SQRT(n_tokens)) AS BIGINT)) OVER () AS w_total,
               SUM(n_tokens) OVER () AS t_total
        FROM per_source
    )
    SELECT source, n_docs, n_tokens,
           weight,
           CAST(weight * 1000 // w_total AS BIGINT) AS target_share_pm,
           CAST(t_total * weight // w_total AS BIGINT) AS alloc_tokens,
           CAST((t_total * weight // w_total) * 1000 // n_tokens AS BIGINT)
               AS epochs_milli
    FROM weighted
"""


@register(
    "corpus_temperature_mix",
    oracle=_TEMP_ORACLE_SQL,
    tags=("corpus", "agg"),
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_tokens, weight, target_share_pm,
    alloc_tokens, epochs_milli): the T=1/2 temperature mix over one
    corpus-worth of tokens — small sources oversample past 1000
    milli-epochs, large ones subsample (unit test pins the flattening
    direction and token conservation within truncation)."""
    per_source = (
        table(spark, sf_dir, "documents")
        .select("source", F.size(H.tokens(F.col("text"))).alias("toks"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("long").alias("n_tokens"),
        )
    )
    w_all = Window.partitionBy()
    weighted = per_source.withColumn(
        "weight", F.floor(F.sqrt(F.col("n_tokens"))).cast("long")
    ).withColumn("w_total", F.sum("weight").over(w_all)).withColumn(
        "t_total", F.sum("n_tokens").over(w_all)
    )
    return weighted.select(
        "source",
        "n_docs",
        "n_tokens",
        "weight",
        F.expr("weight * 1000 div w_total").cast("long").alias(
            "target_share_pm"
        ),
        F.expr("t_total * weight div w_total").cast("long").alias(
            "alloc_tokens"
        ),
        F.expr("(t_total * weight div w_total) * 1000 div n_tokens")
        .cast("long")
        .alias("epochs_milli"),
    )

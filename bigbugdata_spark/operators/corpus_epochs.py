"""Epoch / repetition planning for a target language mix (round 11) —
the data-constrained-scaling card a pretraining run computes before
touching a GPU: given the corpus' available tokens per language and a
target mix over a total token budget, how many EPOCHS of each
language's data does the run consume (in exact milli-epochs), and
which languages are oversampled past one pass (the repetition that
data-constrained scaling-law work shows degrades past ~4 epochs).
corpus_mix_sample draws a mix-shaped SAMPLE; corpus_budget_trim cuts
to a budget; this is the planning view ABOVE both — the table that
decides whether the mix is even feasible before any sampling runs.

No analog in the reference (SURVEY §2.1); corpus-governance extension
surface.

Arithmetic is exact BIGINT end-to-end: the budget is BUDGET_X times
the corpus' total whitespace-token count, each language's token need
is budget * target_pm // 1000, and epochs_milli is
need * 1000 // available — truncating division on non-negative values,
identical in Spark `div` and DuckDB `//`.  Languages missing from the
target table get target_pm = 0 (they are excluded from the plan's mix
but still reported).

Scale posture: one documents scan -> per-language token aggregate
(map-side combinable, |langs| rows) -> every downstream step is
constant-size arithmetic on that panel plus one single-row total
(a window over the |langs|-row frame, not the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.registry import register

#: total training budget, as a multiple of the corpus' total tokens —
#: >1 forces oversampling somewhere, which is the interesting case
BUDGET_X = 2

#: target mix in permille (sums to 1000); the en-heavy shape a
#: multilingual pretraining mix typically pins
TARGET_PM = {"en": 500, "de": 150, "es": 130, "fr": 120, "zh": 100}

_TARGET_VALUES = ", ".join(f"('{k}', {v})" for k, v in sorted(TARGET_PM.items()))

_EPOCH_SQL = f"""
    WITH avail AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({H.sql_tokens('text')})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM avail),
    tgt (lang, target_pm) AS (VALUES {_TARGET_VALUES})
    SELECT a.lang, a.n_docs, a.n_tokens,
           CAST(COALESCE(t.target_pm, 0) AS BIGINT) AS target_pm,
           CAST(CAST({BUDGET_X} AS BIGINT) * tot.total
                * COALESCE(t.target_pm, 0) // 1000 AS BIGINT) AS need_tokens,
           CAST(CAST({BUDGET_X} AS BIGINT) * tot.total
                * COALESCE(t.target_pm, 0) // 1000 * 1000
                // a.n_tokens AS BIGINT) AS epochs_milli,
           CAST(CAST({BUDGET_X} AS BIGINT) * tot.total
                * COALESCE(t.target_pm, 0) // 1000 * 1000
                // a.n_tokens > 1000 AS INT) AS oversampled
    FROM avail a LEFT JOIN tgt t ON a.lang = t.lang
    CROSS JOIN tot
"""


@register(
    "corpus_epoch_mix_plan",
    oracle=_EPOCH_SQL,
    tags=("corpus", "agg"),
)
def corpus_epoch_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, n_tokens, target_pm, need_tokens, epochs_milli,
    oversampled): per language, the available volume, the mix target,
    the budgeted token need (BUDGET_X x corpus total x target share),
    and the exact milli-epoch repetition that need implies — >1000
    flags oversampling past one full pass."""
    avail = (
        table(spark, sf_dir, "documents")
        .select("lang", F.size(H.tokens(F.col("text"))).cast("long").alias("t"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("t").alias("n_tokens"),
        )
    )
    tgt = spark.createDataFrame(
        sorted(TARGET_PM.items()), "lang string, target_pm long"
    )
    w = Window.partitionBy()  # |langs|-row panel, not the corpus
    planned = (
        avail.join(F.broadcast(tgt), "lang", "left")
        .withColumn("target_pm", F.coalesce("target_pm", F.lit(0)))
        .withColumn("total", F.sum("n_tokens").over(w))
        .withColumn(
            "need_tokens",
            F.expr(f"{BUDGET_X}L * total * target_pm div 1000"),
        )
        .withColumn(
            "epochs_milli", F.expr("need_tokens * 1000 div n_tokens")
        )
    )
    return planned.select(
        "lang",
        "n_docs",
        "n_tokens",
        "target_pm",
        "need_tokens",
        "epochs_milli",
        (F.col("epochs_milli") > 1000).cast("int").alias("oversampled"),
    )

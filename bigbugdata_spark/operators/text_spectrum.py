"""Term frequency-of-frequencies spectrum (round 10) — the Good-Turing
table: how many distinct terms occur exactly k times in the corpus.
This is the lexical-health card tokenizer and LM work actually reads
(N1/N ~= the unseen-mass estimate, hapax share flags OCR/boilerplate
noise, a bent spectrum flags template spam) and the direct input to
Good-Turing smoothing; text_token_stats gives totals, the spectrum
gives the SHAPE.

No analog in the reference (SURVEY §2.1); text extension surface next
to text_bigram_lm (whose smoothing would consume exactly this table).

Determinism: two exact integer groupBys; the tail coarsens into a
single k > SPECTRUM_MAX bucket keyed by -1 so the output stays
card-sized with no fixture-dependent row count.

Scale posture: the classic two-stage "frequency of frequencies" —
term counts are one map-side-combinable groupBy over exploded tokens
(the shuffle spreads over the vocabulary), the spectrum is a second
groupBy over the VOCABULARY-sized frame, output <= SPECTRUM_MAX + 1
rows.  At 100 TB stage two's input is Heaps'-law bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.registry import register

SPECTRUM_MAX = 20  # exact spectrum rows for k = 1..20; k > 20 pools at -1

_SPECTRUM_SQL = f"""
    WITH toks AS (
        SELECT unnest({H.sql_tokens('text')}) AS term FROM documents
    ),
    tf AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS f
        FROM toks WHERE term != '' GROUP BY term
    )
    SELECT CASE WHEN f <= {SPECTRUM_MAX} THEN f ELSE -1 END AS k,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(f) AS BIGINT) AS n_tokens
    FROM tf GROUP BY k
"""


@register(
    "text_freq_spectrum",
    oracle=_SPECTRUM_SQL,
    tags=("text", "agg"),
)
def text_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, n_terms, n_tokens): how many distinct terms occur exactly k
    times and how many token occurrences they carry, k = 1..SPECTRUM_MAX
    exact and the heavier tail pooled at k = -1 — the Good-Turing
    frequency-of-frequencies table."""
    toks = table(spark, sf_dir, "documents").select(
        F.explode(H.tokens(F.col("text"))).alias("term")
    )
    tf = (
        toks.filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    k = F.when(F.col("f") <= SPECTRUM_MAX, F.col("f")).otherwise(
        F.lit(-1)
    )
    return (
        tf.groupBy(k.alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("f").cast("long").alias("n_tokens"),
        )
    )

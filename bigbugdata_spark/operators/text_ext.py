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

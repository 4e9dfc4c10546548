"""Dedup survivorship-quality accounting (round 13) — the governance
card that answers "is dedup throwing away good documents?": the corpus
split into the cluster-keep decision's two cohorts (kept
representatives vs removed near-dup members), each with exact doc,
token, and quality-decipoint totals.  A dedup stage that
systematically removes higher-quality docs than it keeps (a bad
tie-break, a skewed shingle space) shows up here as deci_avg_centi
inversion, before the corpus ships.

Composition: dedup_cluster_keep's decision (min-label connected
components over verified near-dup pairs — the exact dedup stage the
release pipelines apply) x the shared quality decipoint rule
(fragments.quality_base_frame / quality_deci_col — the ONE definition
every quality consumer builds from).  All integers: counts, token
sums, decipoint sums, and a truncating centi-average, so the oracle
hash-compares exactly.

No analog in the reference (SURVEY §2.1); corpus-governance extension
surface.

Scale posture: the near-dup pair graph rides the bucketed inverted-
index join (never all-pairs); the quality side is one scan of
documents with pure column expressions; the final aggregate is
two-row. At 100 TB the keep frame is the persisted dedup decision a
release pipeline already materializes — this card is one join + one
aggregate over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.functions.fragments import (
    CLUSTER_KEEP_BODY_SQL,
    CLUSTER_KEEP_CTES_SQL,
    QUALITY_BASE_SQL,
    QUALITY_DECI_SQL,
)
from bigbugdata_spark.registry import register

# keeps = the shared keep-decision fragments verbatim (r13 review: a
# copied CTE chain would fork from dedup_cluster_keep's oracle the day
# the shared rule changes)
_SURVIVOR_ORACLE_SQL = f"""
    WITH RECURSIVE {CLUSTER_KEEP_CTES_SQL},
    keeps AS ({CLUSTER_KEEP_BODY_SQL}),
    {QUALITY_BASE_SQL},
    scored AS (
        SELECT doc_id, n_tokens, {QUALITY_DECI_SQL} AS deci FROM base
    )
    SELECT CASE WHEN k.keep = 1 THEN 'kept' ELSE 'removed' END AS cohort,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(s.n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(s.deci) AS BIGINT) AS deci_sum,
           CAST(SUM(s.deci) * 100 // COUNT(*) AS BIGINT) AS deci_avg_centi
    FROM keeps k JOIN scored s ON k.doc_id = s.doc_id
    GROUP BY 1
"""


@register(
    "corpus_survivor_quality",
    oracle=_SURVIVOR_ORACLE_SQL,
    tags=("corpus", "dedup", "agg"),
)
def corpus_survivor_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cohort, n_docs, total_tokens, deci_sum, deci_avg_centi) for
    cohort in {kept, removed} under the exact cluster-keep decision:
    integer quality-decipoint totals plus a truncating centi-average,
    so a quality-biased dedup stage is a visible inversion, not a
    vibe."""
    from bigbugdata_spark.functions.fragments import (
        quality_base_frame,
        quality_deci_col,
    )
    from bigbugdata_spark.operators.dedup import dedup_cluster_keep

    keep = dedup_cluster_keep(spark, sf_dir).select("doc_id", "keep")
    scored = quality_base_frame(spark, sf_dir).select(
        "doc_id", "n_tokens", quality_deci_col().alias("deci")
    )
    return (
        scored.join(keep, "doc_id")
        .groupBy(
            F.when(F.col("keep") == 1, F.lit("kept"))
            .otherwise(F.lit("removed"))
            .alias("cohort")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("deci").cast("long").alias("deci_sum"),
        )
        .select(
            "cohort",
            "n_docs",
            "total_tokens",
            "deci_sum",
            F.expr("deci_sum * 100 div n_docs")
            .cast("long")
            .alias("deci_avg_centi"),
        )
    )

"""Quality-threshold retention curve (round 12) — the corpus-planning
view of text_quality_score, exactly what dedup_threshold_curve is to
the near-dup family: for every possible quality cutoff (the score is a
sum of integer DECIPOINTS — 0, 3, 4, 6, 7, 10 are the reachable
values; the curve sweeps all 0..10), how many documents, tokens and
characters survive `quality >= t/10`, as counts and integer permille.
A corpus builder reads this to pick the cutoff that meets a token
budget before running the filter.

Shares the quality DEFINITION with text_quality_score through
fragments.QUALITY_BASE_SQL / QUALITY_DECI_SQL — one rule family, so
the curve can never drift from the registered score (the sampler
threshold precedent, corpus_version.py).

No analog in the reference (SURVEY §2.1); text extension surface.

Scale posture: one documents scan -> per-doc integer decipoints (the
same expression tree as the score query) -> an 11-row threshold
cross-join (broadcast literal range) -> a |thresholds|-keyed map-side
aggregate.  The cross-join multiplies per-DOC rows by 11, never
tokens; an equivalent single-pass form aggregates by deci value and
prefix-sums 11 rows — kept as the cross-join because Catalyst folds
the tiny range and the shuffle is 11 keys either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.functions.fragments import (
    QUALITY_BASE_SQL,
    QUALITY_DECI_SQL,
)
from bigbugdata_spark.registry import register

_QCURVE_ORACLE_SQL = f"""
    WITH {QUALITY_BASE_SQL},
    scored AS (
        SELECT doc_id, n_chars_obs, n_tokens,
               {QUALITY_DECI_SQL} AS deci
        FROM base
    ),
    totals AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS t_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS t_tokens,
               CAST(SUM(n_chars_obs) AS BIGINT) AS t_chars
        FROM scored
    )
    SELECT t.threshold_deci,
           CAST(COUNT(*) FILTER (s.deci >= t.threshold_deci) AS BIGINT)
               AS docs_kept,
           CAST(COALESCE(SUM(s.n_tokens)
                    FILTER (s.deci >= t.threshold_deci), 0) AS BIGINT)
               AS tokens_kept,
           CAST(COALESCE(SUM(s.n_chars_obs)
                    FILTER (s.deci >= t.threshold_deci), 0) AS BIGINT)
               AS chars_kept,
           CAST(COALESCE(SUM(s.n_tokens)
                    FILTER (s.deci >= t.threshold_deci), 0) * 1000
                // MAX(tt.t_tokens) AS BIGINT) AS tokens_kept_pm
    FROM scored s
    CROSS JOIN (SELECT CAST(unnest(range(0, 11)) AS BIGINT)
                    AS threshold_deci) t
    CROSS JOIN totals tt
    GROUP BY t.threshold_deci
"""


@register(
    "text_quality_threshold_curve",
    oracle=_QCURVE_ORACLE_SQL,
    tags=("text", "agg"),
)
def text_quality_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(threshold_deci, docs_kept, tokens_kept, chars_kept,
    tokens_kept_pm) for thresholds 0..10 decipoints — monotone
    non-increasing in the threshold (unit test), threshold 0 retains
    everything."""
    # the shared base counts + decipoint rule (ADVICE r12 / r13: these
    # were literal copies next to QUALITY_BASE_SQL/QUALITY_DECI_SQL and
    # text_quality_score — now every consumer builds from fragments)
    from bigbugdata_spark.functions.fragments import (
        quality_base_frame,
        quality_deci_col,
    )

    base = quality_base_frame(spark, sf_dir)
    deci = quality_deci_col()
    scored = base.select(
        deci.cast("long").alias("deci"), "n_tokens", "n_chars_obs"
    )
    thresholds = spark.range(0, 11).select(
        F.col("id").cast("long").alias("threshold_deci")
    )
    total_tokens = scored.agg(
        F.sum("n_tokens").cast("long").alias("t_tokens")
    )
    kept = F.col("deci") >= F.col("threshold_deci")
    return (
        scored.join(F.broadcast(thresholds), F.lit(True))
        .join(F.broadcast(total_tokens), F.lit(True))
        .groupBy("threshold_deci")
        .agg(
            F.count(F.when(kept, 1)).cast("long").alias("docs_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0))
            .cast("long")
            .alias("tokens_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("n_chars_obs"))), F.lit(0))
            .cast("long")
            .alias("chars_kept"),
            F.expr(
                "coalesce(sum(CASE WHEN deci >= threshold_deci THEN n_tokens END), 0)"
                " * 1000 div max(t_tokens)"
            )
            .cast("long")
            .alias("tokens_kept_pm"),
        )
    )

"""Budget-constrained corpus selection (round 8) — "give me the best
TOKEN_BUDGET tokens": bands of documents (quality milli-score x
language, best quality first) are admitted whole while the budget
lasts; the marginal band is admitted partially via a deterministic
hash draw sized to the remaining budget; later bands are dropped. The
compute-budget planning step every pretraining run does before it
touches a trainer — and the non-uniform, budget-aware cousin of
corpus_mix_sample (fixed per-language quotas) and
corpus_quality_weighted_sample (score-proportional retention).

No analog in the reference (SURVEY §2.1); corpus-governance extension
surface.

Determinism discipline: band totals and cumulative sums are exact
BIGINTs over a band-count-sized frame; the marginal band's admission
fraction is integer permille (remaining * 1000 // band_total, both
engines' integer division truncating); the partial draw is the repo's
standard affine-hash permille on doc_id (fresh constants — independent
of the split/mix/sample draws). No RNG, no fp anywhere near a
selection decision: re-running the pipeline admits exactly the same
documents.

Scale posture: one scan -> per-band aggregate (map-side combinable,
|bands| rows out) -> window math on the tiny band frame -> one
broadcast join back onto the per-document frame for the marginal
band's recount. Nothing driver-side; the admitted-set filter is the
same expression a writer would partition on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.functions.fragments import QUALITY_SQL as _QUALITY_SQL
from bigbugdata_spark.registry import register

TOKEN_BUDGET = 20_000  # tokens to admit (sf0.01 corpus holds ~27k)
TRIM_A, TRIM_B = 48_271, 9_973  # fresh affine draw constants


@register(
    "corpus_budget_trim",
    oracle=f"""
        WITH q AS ({_QUALITY_SQL}),
        banded AS (
            SELECT q.doc_id, q.n_tokens,
                   CAST(ROUND(q.quality * 1000) AS BIGINT) AS q_milli,
                   d.lang,
                   ({TRIM_A} * q.doc_id + {TRIM_B}) % {H.P} % 1000 AS draw
            FROM q JOIN documents d ON q.doc_id = d.doc_id
        ),
        bands AS (
            SELECT q_milli, lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
            FROM banded GROUP BY q_milli, lang
        ),
        cum AS (
            SELECT q_milli, lang, n_docs, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                        ORDER BY q_milli DESC, lang) AS BIGINT) AS cum_tokens
            FROM bands
        ),
        status AS (
            SELECT *,
                   CASE WHEN cum_tokens <= {TOKEN_BUDGET} THEN 'full'
                        WHEN cum_tokens - n_tokens < {TOKEN_BUDGET}
                             THEN 'partial'
                        ELSE 'dropped' END AS status,
                   ({TOKEN_BUDGET} - (cum_tokens - n_tokens)) * 1000
                       // n_tokens AS frac_pm
            FROM cum
        )
        SELECT s.q_milli, s.lang, s.n_docs, s.n_tokens, s.status,
               CASE s.status
                    WHEN 'full' THEN s.n_docs
                    WHEN 'dropped' THEN 0
                    ELSE (SELECT CAST(COALESCE(SUM(CASE WHEN b.draw
                                   < s.frac_pm THEN 1 ELSE 0 END), 0)
                                 AS BIGINT)
                          FROM banded b
                          WHERE b.q_milli = s.q_milli AND b.lang = s.lang)
               END AS n_docs_sel,
               CASE s.status
                    WHEN 'full' THEN s.n_tokens
                    WHEN 'dropped' THEN 0
                    ELSE (SELECT CAST(COALESCE(SUM(CASE WHEN b.draw
                                   < s.frac_pm THEN b.n_tokens ELSE 0 END), 0)
                                 AS BIGINT)
                          FROM banded b
                          WHERE b.q_milli = s.q_milli AND b.lang = s.lang)
               END AS n_tokens_sel
        FROM status s
    """,
    tags=("corpus", "agg"),
)
def corpus_budget_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (quality-milli, lang) band in admission order: volume, the
    band's admission status under TOKEN_BUDGET (full / partial /
    dropped), and the admitted doc/token counts — the partial band
    recounted under its integer-permille hash draw."""
    # deferred import keeps registration order exact under load_all
    from bigbugdata_spark.catalog import table
    from bigbugdata_spark.operators.text import text_quality_score

    q = text_quality_score(spark, sf_dir)
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    banded = q.join(docs, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(F.col("quality") * 1000).cast("long").alias("q_milli"),
        "lang",
        ((F.lit(TRIM_A) * F.col("doc_id") + F.lit(TRIM_B)) % F.lit(H.P) % 1000)
        .alias("draw"),
    )
    bands = banded.groupBy("q_milli", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    w = Window.orderBy(F.desc("q_milli"), F.asc("lang"))  # |bands|-row frame
    cum = bands.select(
        "q_milli",
        "lang",
        "n_docs",
        "n_tokens",
        F.sum("n_tokens").over(w).alias("cum_tokens"),
    )
    status = cum.select(
        "*",
        F.when(F.col("cum_tokens") <= TOKEN_BUDGET, "full")
        .when(F.col("cum_tokens") - F.col("n_tokens") < TOKEN_BUDGET, "partial")
        .otherwise("dropped")
        .alias("status"),
        F.expr(
            f"(({TOKEN_BUDGET} - (cum_tokens - n_tokens)) * 1000)"
            f" div n_tokens"
        ).alias("frac_pm"),
    )
    # recount the (single) partial band under its draw threshold; the
    # band/status frame is |bands|-sized, so it broadcasts onto banded
    part = (
        banded.join(
            F.broadcast(
                status.where(F.col("status") == "partial").select(
                    "q_milli", "lang", "frac_pm"
                )
            ),
            ["q_milli", "lang"],
        )
        .where(F.col("draw") < F.col("frac_pm"))
        .groupBy("q_milli", "lang")
        .agg(
            F.count(F.lit(1)).alias("sel_docs"),
            F.sum("n_tokens").alias("sel_tokens"),
        )
    )
    out = status.join(part, ["q_milli", "lang"], "left")
    n_docs_sel = (
        F.when(F.col("status") == "full", F.col("n_docs"))
        .when(F.col("status") == "dropped", F.lit(0))
        .otherwise(F.coalesce(F.col("sel_docs"), F.lit(0)))
    )
    n_tokens_sel = (
        F.when(F.col("status") == "full", F.col("n_tokens"))
        .when(F.col("status") == "dropped", F.lit(0))
        .otherwise(F.coalesce(F.col("sel_tokens"), F.lit(0)))
    )
    return out.select(
        "q_milli",
        "lang",
        "n_docs",
        "n_tokens",
        "status",
        n_docs_sel.cast("long").alias("n_docs_sel"),
        n_tokens_sel.cast("long").alias("n_tokens_sel"),
    )

"""Classifier-evaluation card for the language-ID heuristic (round 10)
— the confusion matrix the corpus-governance loop reads before trusting
a cheap classifier to route 100 TB: per (true_lang, pred_lang) cell,
document count, the true class's total, and the row-normalized share
(recall on the diagonal, the leak destination off it).  The predictor
is the SAME expression tree as text_lang_id (functions/langid_core.py),
so this card evaluates exactly the classifier the pipeline runs —
model evaluation as a first-class relational operator.

No analog in the reference (SURVEY §2.1); text/dq extension surface.

Determinism: BIGINT cell counts; the single IEEE division per cell
divides identical integers in both engines.

Scale posture: one pruned scan -> per-row predict (no shuffle) -> one
(true, pred) hash aggregate (at most |langs|^2 cells survive); class
totals re-aggregate the CELLS frame (cells-sized, never the corpus)
and broadcast back onto it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.caching import pin
from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.functions.langid_core import LANG_PRED_SQL, pred_lang
from bigbugdata_spark.registry import register

_CONF_SQL = f"""
    WITH pred AS ({LANG_PRED_SQL}),
    cells AS (
        SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred GROUP BY true_lang, pred_lang
    ),
    tot AS (
        SELECT true_lang, CAST(SUM(n_docs) AS BIGINT) AS true_total
        FROM cells GROUP BY true_lang
    )
    SELECT c.true_lang, c.pred_lang, c.n_docs, t.true_total,
           CAST(c.n_docs AS DOUBLE) / CAST(t.true_total AS DOUBLE)
               AS row_share
    FROM cells c JOIN tot t ON c.true_lang = t.true_lang
"""


@register(
    "text_lang_confusion",
    oracle=_CONF_SQL,
    tags=("text", "dq", "agg"),
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(true_lang, pred_lang, n_docs, true_total, row_share) — the
    language-ID confusion matrix over the labeled corpus: the diagonal
    share is per-class recall, off-diagonal cells say where a class
    leaks.  Occupied cells only; totals aggregate the cells frame."""
    docs = table(spark, sf_dir, "documents").select(
        F.col("lang").alias("true_lang"),
        pred_lang(H.tokens(F.col("text"))).alias("pred_lang"),
    )
    # the cells frame feeds both the matrix and the class totals —
    # pinned per the caching contract so the corpus is scanned ONCE
    cells = pin(
        docs.groupBy("true_lang", "pred_lang").agg(
            F.count(F.lit(1)).alias("n_docs")
        )
    )
    tot = cells.groupBy("true_lang").agg(
        F.sum("n_docs").alias("true_total")
    )
    return cells.join(F.broadcast(tot), "true_lang").select(
        "true_lang",
        "pred_lang",
        "n_docs",
        "true_total",
        (F.col("n_docs").cast("double") / F.col("true_total").cast("double")).alias(
            "row_share"
        ),
    )

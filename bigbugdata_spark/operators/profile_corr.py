"""Exact-moment correlation profiling (round 8) — Pearson correlation
between document length in characters and in tokens, computed the
hash-exact way: the six raw moments (n, Σx, Σy, Σx², Σy², Σxy) are
exact BIGINT aggregates, the final products run in DECIMAL(38,0)
(Spark) / HUGEINT (DuckDB) — the dq_drift overflow discipline — and r
comes out of a fixed fp64 expression over those exact integers. No
engine corr() aggregate is touched (their accumulation order is
engine-internal and fp-order-dependent — the same reason
dq_volume_anomaly writes out its variance).

Why this pair: chars-per-token is the repo's quality signal
(fragments.QUALITY_SQL); its usefulness rests on length-in-chars and
length-in-tokens being strongly but not perfectly correlated. The
profiler turns that assumption into a measured, driver-verifiable
number — and the same template extends to any integer column pair.

No analog in the reference (SURVEY §2.1); profile extension surface
alongside prof_length_summary.

Scale posture: ONE scan, one map-side-combinable aggregate to a single
row. Nothing shuffles more than six integers per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.registry import register

_DEC = "decimal(38,0)"


@register(
    "prof_corr_chars_tokens",
    oracle=f"""
        WITH m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sum_x,
                   CAST(SUM(y) AS BIGINT) AS sum_y,
                   CAST(SUM(x * x) AS BIGINT) AS sum_xx,
                   CAST(SUM(y * y) AS BIGINT) AS sum_yy,
                   CAST(SUM(x * y) AS BIGINT) AS sum_xy
            FROM (
                SELECT CAST(length(text) AS BIGINT) AS x,
                       CAST(len({H.sql_tokens('text')}) AS BIGINT) AS y
                FROM documents
            )
        )
        SELECT n, sum_x, sum_y, sum_xx, sum_yy, sum_xy,
               CAST(CAST(n AS HUGEINT) * sum_xy
                    - CAST(sum_x AS HUGEINT) * sum_y AS DOUBLE)
               / (sqrt(CAST(CAST(n AS HUGEINT) * sum_xx
                            - CAST(sum_x AS HUGEINT) * sum_x AS DOUBLE))
                  * sqrt(CAST(CAST(n AS HUGEINT) * sum_yy
                              - CAST(sum_y AS HUGEINT) * sum_y AS DOUBLE)))
                   AS corr
        FROM m
    """,
    tags=("profile", "agg"),
)
def prof_corr_chars_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: the six exact raw moments of (n_chars, n_tokens) and
    their Pearson correlation from the closed-form moment identity."""
    xy = table(spark, sf_dir, "documents").select(
        F.length("text").cast("long").alias("x"),
        F.size(H.tokens(F.col("text"))).cast("long").alias("y"),
    )
    m = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
        F.sum(F.col("x") * F.col("x")).alias("sum_xx"),
        F.sum(F.col("y") * F.col("y")).alias("sum_yy"),
        F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
    )
    n, sx, sy = F.col("n").cast(_DEC), F.col("sum_x").cast(_DEC), F.col("sum_y").cast(_DEC)
    num = (n * F.col("sum_xy") - sx * F.col("sum_y")).cast("double")
    den_x = F.sqrt((n * F.col("sum_xx") - sx * F.col("sum_x")).cast("double"))
    den_y = F.sqrt((n * F.col("sum_yy") - sy * F.col("sum_y")).cast("double"))
    return m.select(
        "n",
        "sum_x",
        "sum_y",
        "sum_xx",
        "sum_yy",
        "sum_xy",
        (num / (den_x * den_y)).alias("corr"),
    )

"""Near-dup threshold sensitivity curve (round 9) — the dataset-card
companion to the dedup family: how many verified near-dup pairs (and
implicated documents) exist per Jaccard band above the operating
threshold.  The table behind choosing JACCARD_T: a cliff between bands
means the threshold is load-bearing; a flat curve means the corpus'
duplication is insensitive to it.

No analog in the reference (SURVEY §2.1); dedup governance extension
surface over the same verified pair machinery as dedup_minhash_lsh.

Scale posture: rides the banded-LSH pipeline verbatim (bucketed
candidates + bounded exact verify, never all-pairs; equality to ground
truth at this corpus' J >= 0.9 level, see dedup.py); the banding is
tuned for the BASE threshold, and every band reported here sits ABOVE
it, where banding recall only improves.  The curve aggregate runs on
the pair frame (tiny relative to corpus) over a fixed band key space;
bands are floor(j*10) integers so the bucketing is fp-safe (one
multiply + floor of an exact ratio, identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.functions.fragments import JACCARD_PAIRS_SQL
from bigbugdata_spark.registry import register


@register(
    "dedup_threshold_curve",
    oracle=f"""
        WITH pairs AS ({JACCARD_PAIRS_SQL}),
        banded AS (
            SELECT CAST(FLOOR(jaccard * 10) AS BIGINT) AS band, d1, d2
            FROM pairs
        )
        SELECT band,
               CAST(band AS DOUBLE) / 10 AS j_lo,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT d1) + COUNT(DISTINCT d2)
                    AS BIGINT) AS n_sides
        FROM banded GROUP BY band
    """,
    tags=("dedup", "agg"),
)
def dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per Jaccard band [band/10, band/10 + 0.1): verified pair count
    and the distinct-document count per pair side (d1/d2 are
    min/max-ordered by the pair pipeline, so the two sides are distinct
    populations and their sum is the honest implicated-slot count)."""
    from bigbugdata_spark.operators.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir)
    banded = pairs.select(
        F.floor(F.col("jaccard") * 10).cast("long").alias("band"),
        "d1",
        "d2",
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (F.countDistinct("d1") + F.countDistinct("d2"))
            .cast("long")
            .alias("n_sides"),
        )
        .select(
            "band",
            (F.col("band").cast("double") / 10).alias("j_lo"),
            "n_pairs",
            "n_sides",
        )
    )

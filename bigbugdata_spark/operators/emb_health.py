"""Embedding-space health diagnostics (round 8) — per-label cluster
tightness over the embeddings table: how concentrated is each label's
vector cloud around its centroid? The training-data counterpart of "is
my encoder collapsing / are my labels separable", and the first table
anyone profiles before trusting an embedding column for dedup or ANN.

No analog in the reference (SURVEY §2.1); similarity-family extension
surface next to emb_kmeans_assign / emb_quantize_int8.

Determinism discipline (the kmeans.py trick, applied to variance): all
geometry runs over the shared int8 quantization
(functions/quantization.py), where the scatter identity

    sum_i ||q_i - s/n||^2  =  (n * sum_i ||q_i||^2 - ||s||^2) / n^2

needs only exact BIGINT aggregates — per-row squared norms and per-
dimension coordinate sums — so the mean squared distance is a single
fp64 division of two exact integers and sqrt of it is one correctly-
rounded IEEE op: hash-identical in both engines, with NO order-
dependent float accumulation anywhere.

Scale posture: one embeddings scan; the per-dimension centroid sums are
a posexplode + map-side-combinable aggregate on a (|labels| x dim) key
space, the row-norm roll-up a second tiny aggregate — both shuffle
dataset-card-sized frames. At 100 TB nothing is driver-side and no
vector ever pairs with another (this is the O(n) profile, not a join).

Capacity bound (exactness contract): the BIGINT products overflow when
n_label * sumsq approaches 2^63 — with d=64 dims and |q| <= 127 that
is n_label ~ 3e6 vectors per label. Beyond that, promote the three
final products to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — the
aggregates themselves (row norms, coordinate sums) stay far inside
BIGINT for any realistic n — or shard the label and combine partial
(n, s_j, sumsq) triples, which the identity supports associatively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.caching import pin
from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.quantization import (
    quantized_vec,
    sql_quantized_vec,
)
from bigbugdata_spark.registry import register


@register(
    "emb_label_centroid_stats",
    oracle=f"""
        WITH q AS (
            SELECT label, {sql_quantized_vec('embedding')} AS qv
            FROM embeddings
        ),
        rows_ AS (
            SELECT label,
                   CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT)
                       AS rsq
            FROM q
        ),
        per_label AS (
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                   CAST(SUM(rsq) AS BIGINT) AS sumsq
            FROM rows_ GROUP BY label
        ),
        dims AS (
            SELECT label,
                   unnest(range(len(qv))) AS pos,
                   unnest(qv) AS v
            FROM q
        ),
        cent AS (
            SELECT label, CAST(SUM(s * s) AS BIGINT) AS centroid_norm2
            FROM (
                SELECT label, pos, CAST(SUM(v) AS BIGINT) AS s
                FROM dims GROUP BY label, pos
            ) GROUP BY label
        )
        SELECT p.label, n_vecs, sumsq, centroid_norm2,
               CAST(n_vecs * sumsq - centroid_norm2 AS DOUBLE)
                   / (n_vecs * n_vecs) AS msd,
               sqrt(CAST(n_vecs * sumsq - centroid_norm2 AS DOUBLE)
                    / (n_vecs * n_vecs)) AS rmsd
        FROM per_label p JOIN cent USING (label)
    """,
    tags=("similarity", "agg", "profile"),
)
def emb_label_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per label: vector count, exact sum of squared quantized norms,
    exact squared centroid-sum norm, and the mean/root-mean squared
    distance to the label centroid derived by the integer scatter
    identity (msd in quantized units^2)."""
    # pinned: the quantized frame feeds the row-norm and the
    # per-dimension aggregates — one quantization pass, not two
    q = pin(
        table(spark, sf_dir, "embeddings").select(
            "label", quantized_vec(F.col("embedding")).alias("qv")
        )
    )
    per_label = (
        q.select(
            "label",
            F.aggregate(
                "qv", F.lit(0).cast("long"), lambda acc, x: acc + x * x
            ).alias("rsq"),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("rsq").alias("sumsq"),
        )
    )
    cent = (
        q.select("label", F.posexplode("qv").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.sum("v").alias("s"))
        .groupBy("label")
        .agg(F.sum(F.col("s") * F.col("s")).alias("centroid_norm2"))
    )
    scatter = (F.col("n_vecs") * F.col("sumsq") - F.col("centroid_norm2")).cast(
        "double"
    )
    msd = scatter / (F.col("n_vecs") * F.col("n_vecs"))
    return per_label.join(cent, "label").select(
        "label",
        "n_vecs",
        "sumsq",
        "centroid_norm2",
        msd.alias("msd"),
        F.sqrt(msd).alias("rmsd"),
    )

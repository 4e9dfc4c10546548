"""Embedding quantization — the vector-compression stage of a large-scale
embedding pipeline (int8 scalar quantization: 4x smaller vectors, the
standard serving format before IVF/PQ indexes; no analog in the
reference, which has no vector data at all).

Per vector: scale = 127 / max|x|, q_j = round(x_j * scale) in [-127,127].
All arithmetic is float->double exact promotion, one double division for
the scale, and half-away-from-zero rounding — identical in Spark and
DuckDB, so the registered query has an EXACT oracle over compact
per-vector summaries (component sum / L1 / extrema of the quantized
array) rather than 64-column rows.

Scale posture: pure per-row expression work (transform/aggregate HOFs,
JVM-side, no shuffle at all); at 100 TB this is a map-only pass that
rewrites the embedding column in place."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

Q_MAX = 127


# THE int8 quantization definition, shared with operators/kmeans.py —
# the hash-exact oracle contract of every consumer rests on the Spark
# and SQL forms staying semantically identical, so both live here in
# one place (same lockstep discipline as functions/hashing.py).


def quantized_vec(emb):
    """array<bigint> int8 quantization of a float-array Column.

    The per-row max|x| is let-bound (hashing.let_bound) so it is
    EVALUATED ONCE per row: referencing the array_max expression
    directly inside the per-element lambda would inline and re-run it
    for every element — interpreted HOFs get no common-subexpression
    elimination across lambda bodies, turning O(d) into O(d^2) per row
    (the regression the first shared-builder version shipped).

    An all-zero vector gets scale 0 (not 127/0 = inf, whose 0 * inf =
    NaN would silently poison every consumer distance — the kmeans
    assignment shares this builder): its quantized form is the zero
    vector, the only value that round-trips q_j * (max|x|/127) = x_j."""
    from pyspark.sql import functions as F

    from bigbugdata_spark.functions.hashing import let_bound

    max_abs = F.array_max(F.transform(emb, lambda x: F.abs(x.cast("double"))))
    return let_bound(
        max_abs,
        lambda m: F.transform(
            emb,
            lambda x: F.round(
                x.cast("double")
                * F.when(m == 0.0, F.lit(0.0)).otherwise(F.lit(float(Q_MAX)) / m)
            ).cast("long"),
        ),
    )


def sql_quantized_vec(emb: str) -> str:
    """DuckDB twin of quantized_vec (bit-identical rounding, same
    all-zero-vector -> zero-vector guard)."""
    max_abs = f"list_max(list_transform({emb}, y -> abs(CAST(y AS DOUBLE))))"
    scale = f"(CASE WHEN {max_abs} = 0 THEN 0.0 ELSE {Q_MAX} / {max_abs} END)"
    return (
        f"list_transform({emb}, x -> CAST(round(CAST(x AS DOUBLE)"
        f" * {scale}) AS BIGINT))"
    )


@register(
    "emb_quantize_int8",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
                       AS max_abs,
                   {sql_quantized_vec("embedding")} AS qv
            FROM embeddings
        )
        SELECT vec_id,
               max_abs,
               CAST(list_sum(qv) AS BIGINT) AS q_sum,
               CAST(list_sum(list_transform(qv, v -> abs(v))) AS BIGINT) AS q_l1,
               CAST(list_max(qv) AS BIGINT) AS q_max,
               CAST(list_min(qv) AS BIGINT) AS q_min
        FROM q
    """,
    tags=("similarity", "project"),
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization summary per vector. The quantized array
    itself is the payload a real pipeline would write back to parquet;
    the registered output reduces it to exact integer summaries so the
    cross-engine hash compare pins every component's value (a wrong
    rounding or scale in ANY component shifts q_sum/q_l1/extrema)."""
    e = table(spark, sf_dir, "embeddings")
    max_abs = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    return (
        e.select(
            "vec_id",
            max_abs.alias("max_abs"),
            quantized_vec(F.col("embedding")).alias("qv"),
        )
        .select(
            "vec_id",
            "max_abs",
            F.aggregate(
                "qv", F.lit(0).cast("long"), lambda acc, v: acc + v
            ).alias("q_sum"),
            F.aggregate(
                "qv", F.lit(0).cast("long"), lambda acc, v: acc + F.abs(v)
            ).alias("q_l1"),
            F.array_max("qv").alias("q_max"),
            F.array_min("qv").alias("q_min"),
        )
    )

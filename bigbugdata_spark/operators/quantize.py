"""Embedding quantization — the vector-compression stage of a large-scale
embedding pipeline (int8 scalar quantization: 4x smaller vectors, the
standard serving format before IVF/PQ indexes; no analog in the
reference, which has no vector data at all).

The quantization definition itself (Spark + SQL builders in lockstep)
lives in functions/quantization.py so that consumers — the kmeans
oracle re-derives it in SQL — can import it without triggering this
module's query registration.

Scale posture: pure per-row expression work (transform/aggregate HOFs,
JVM-side, no shuffle at all); at 100 TB this is a map-only pass that
rewrites the embedding column in place."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.quantization import (
    quantized_vec,
    sql_quantized_vec,
)
from bigbugdata_spark.registry import register


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

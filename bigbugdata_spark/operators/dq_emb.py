"""Embedding-coverage audit (round 8) — the dq gate in front of every
ANN/dedup consumer of the embeddings table: is the corpus fully and
cleanly embedded? Docs without a vector silently vanish from
embedding-based dedup and retrieval; malformed vectors (wrong dim,
NaN/Inf components, all-zero) poison similarity math downstream (the
zero-vector quantization guard exists because exactly this class
reached it). One table answers both before anything consumes the
column.

No analog in the reference (SURVEY §2.1); dq extension surface, the
embedding-side sibling of dq_referential_integrity.

Determinism discipline: every column is an exact count; the vector
defect predicates (dim mismatch, non-finite component, all-zero) are
boolean folds both engines evaluate identically. NaN detection avoids
NaN literals on either side: a component is non-finite iff
(x != x) OR |x| = Inf — expressed as x - x != 0 on doubles (NaN and
Inf both fail), which DuckDB and Spark evaluate identically.

Scale posture: the coverage counts are ONE full-outer join on the id
(at 100 TB both sides bucket by id — sources/bucketed.py — so it is
co-located), and the defect counts are a per-row fold over the vector
column in the same scan; output is one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import EMB_DIM
from bigbugdata_spark.registry import register


@register(
    "dq_emb_coverage",
    oracle=f"""
        WITH defects AS (
            SELECT vec_id,
                   CAST(len(embedding) <> {EMB_DIM} AS INT) AS bad_dim,
                   CAST(len(list_filter(embedding,
                        x -> CAST(x AS DOUBLE) - CAST(x AS DOUBLE) <> 0
                             OR (CAST(x AS DOUBLE) <> CAST(x AS DOUBLE))))
                        > 0 AS INT) AS bad_finite,
                   CAST(len(list_filter(embedding,
                        x -> CAST(x AS DOUBLE) <> 0)) = 0 AS INT) AS all_zero
            FROM embeddings
        ),
        cov AS (
            SELECT CAST(SUM(CASE WHEN e.vec_id IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS docs_without_vec,
                   CAST(SUM(CASE WHEN d.doc_id IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS vecs_without_doc,
                   CAST(SUM(CASE WHEN d.doc_id IS NOT NULL
                                  AND e.vec_id IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS matched
            FROM documents d FULL OUTER JOIN embeddings e
              ON d.doc_id = e.vec_id
        )
        SELECT matched, docs_without_vec, vecs_without_doc,
               (SELECT CAST(SUM(bad_dim) AS BIGINT) FROM defects)
                   AS n_bad_dim,
               (SELECT CAST(SUM(bad_finite) AS BIGINT) FROM defects)
                   AS n_nonfinite,
               (SELECT CAST(SUM(all_zero) AS BIGINT) FROM defects)
                   AS n_all_zero
        FROM cov
    """,
    tags=("dq", "similarity", "join", "agg"),
)
def dq_emb_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row audit: matched doc/vector pairs, docs missing a vector,
    orphan vectors, and vector defect counts (wrong dimension,
    non-finite components, all-zero)."""
    return emb_coverage(
        table(spark, sf_dir, "documents").select("doc_id"),
        table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
    )


def emb_coverage(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """The audit plan over any (documents, embeddings) pair — split out
    because the clean fixture leaves every defect counter at zero; the
    corrupted-fixture test plants each defect class and asserts the
    exact counts."""
    # non-finite iff x - x != 0 (Inf fails arithmetic) OR x != x (NaN)
    defects = emb.select(
        (F.size("embedding") != EMB_DIM).cast("int").alias("bad_dim"),
        (
            F.size(F.filter("embedding", lambda c: (c.cast("double") - c.cast("double") != 0) | (c.cast("double") != c.cast("double"))))
            > 0
        )
        .cast("int")
        .alias("bad_finite"),
        (F.size(F.filter("embedding", lambda c: c.cast("double") != 0)) == 0)
        .cast("int")
        .alias("all_zero"),
    ).agg(
        F.sum("bad_dim").alias("n_bad_dim"),
        F.sum("bad_finite").alias("n_nonfinite"),
        F.sum("all_zero").alias("n_all_zero"),
    )
    cov = (
        docs.join(emb.select("vec_id"), docs.doc_id == F.col("vec_id"), "full")
        .agg(
            F.sum(F.when(F.col("vec_id").isNull(), 1).otherwise(0)).alias(
                "docs_without_vec"
            ),
            F.sum(F.when(F.col("doc_id").isNull(), 1).otherwise(0)).alias(
                "vecs_without_doc"
            ),
            F.sum(
                F.when(
                    F.col("doc_id").isNotNull() & F.col("vec_id").isNotNull(), 1
                ).otherwise(0)
            ).alias("matched"),
        )
    )
    return cov.crossJoin(F.broadcast(defects)).select(
        "matched",
        "docs_without_vec",
        "vecs_without_doc",
        "n_bad_dim",
        "n_nonfinite",
        "n_all_zero",
    )

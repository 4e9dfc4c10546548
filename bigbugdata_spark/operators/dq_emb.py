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
x - x != 0 on doubles — NaN - NaN = NaN and Inf - Inf = NaN, and
NaN != 0 is true in both engines. (An x != x disjunct would be dead
code: Spark SQL and DuckDB both order NaN equal to itself.)

Scale posture: ONE embeddings scan and ONE full-outer id join (at
100 TB both sides bucket by id — sources/bucketed.py — so it is
co-located): the embedding column rides through the join and every
counter folds in a single one-row aggregate on the joined frame —
coverage and defect counts share the scan instead of reading the
wide vector column twice.
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
                        x -> CAST(x AS DOUBLE) - CAST(x AS DOUBLE) <> 0))
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
    joined = docs.join(emb, docs.doc_id == emb.vec_id, "full")
    has_vec = F.col("vec_id").isNotNull()
    # non-finite iff x - x != 0 (NaN-NaN and Inf-Inf are NaN; NaN != 0)
    nonfinite_components = F.size(
        F.filter("embedding", lambda c: c.cast("double") - c.cast("double") != 0)
    )
    zero_components = F.size(
        F.filter("embedding", lambda c: c.cast("double") != 0)
    )

    def flag(cond):
        # defect flags only apply to rows that carry a vector
        return F.sum(F.when(has_vec & cond, 1).otherwise(0))

    return joined.agg(
        F.sum(
            F.when(F.col("doc_id").isNotNull() & has_vec, 1).otherwise(0)
        ).alias("matched"),
        F.sum(F.when(~has_vec, 1).otherwise(0)).alias("docs_without_vec"),
        F.sum(F.when(F.col("doc_id").isNull(), 1).otherwise(0)).alias(
            "vecs_without_doc"
        ),
        flag(F.size("embedding") != EMB_DIM).alias("n_bad_dim"),
        flag(nonfinite_components > 0).alias("n_nonfinite"),
        flag(zero_components == 0).alias("n_all_zero"),
    )

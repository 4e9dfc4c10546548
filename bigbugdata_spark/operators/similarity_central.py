"""Centrality-based exemplar selection (round 10) — the capstone
composition of the round's two graph operators: per mutual-kNN semantic
component, keep the member with the HIGHEST PageRank (ties to the
smaller vec_id) instead of sim_semantic_keep's min-id convention.  The
min-id rule is arbitrary-but-deterministic; the centrality rule keeps
the vector its own neighborhood most agrees is representative — what a
curation pass actually wants from "one exemplar per semantic cluster",
and the standard coreset/diversity-seed picker.

No analog in the reference (SURVEY §2.1); similarity/graph extension
surface composing sim_pagerank + functions/graph.connected_components.

Oracle contract: ONE combined SQL chain — the IVF kNN graph, the
mutual filter, the integer fixed-point PageRank rounds (similarity_rank
verbatim), the component fixpoint as a recursive CTE, and the
(pr DESC, vec_id ASC) argmax — so both engines derive the identical
exemplar table fully independently; every rank is an exact BIGINT.

Scale posture: the pagerank rounds + O(log n) star contraction both
run on the edge list; the argmax is one per-component window over the
nodes frame.  Output is components-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.operators.similarity_rank import (
    _PAGERANK_SQL,
    PR_ROUNDS,
)
from bigbugdata_spark.registry import register

# the pagerank oracle, stripped of its final SELECT so its CTE chain
# (knn/mutual/edges/deg/nodes/nn/pr0..prN) can host the component CTEs
_PR_CTES = _PAGERANK_SQL[: _PAGERANK_SQL.rindex("SELECT p.vec_id")]

_CENTRAL_SQL = (
    _PR_CTES
    + f""",
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
        SELECT n.vec_id,
               CAST(LEAST(n.vec_id, COALESCE(MIN(r.b), n.vec_id)) AS BIGINT)
                   AS component
        FROM nodes n LEFT JOIN reach r ON n.vec_id = r.a
        GROUP BY n.vec_id
    ),
    ranked AS (
        SELECT c.component, c.vec_id, p.pr,
               ROW_NUMBER() OVER (
                   PARTITION BY c.component
                   ORDER BY p.pr DESC, c.vec_id ASC
               ) AS rn,
               COUNT(*) OVER (PARTITION BY c.component) AS n_members
        FROM comp c JOIN pr{PR_ROUNDS} p ON c.vec_id = p.vec_id
    )
    SELECT component,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(vec_id AS BIGINT) AS exemplar_id,
           CAST(pr AS BIGINT) AS exemplar_pr_ppb
    FROM ranked WHERE rn = 1
    """
)


@register(
    "sim_central_exemplars",
    oracle=_CENTRAL_SQL,
    tags=("similarity", "graph", "iterative", "window"),
    index_writer=True,
)
def sim_central_exemplars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(component, n_members, exemplar_id, exemplar_pr_ppb): each
    semantic component's most central member by integer-ppb PageRank,
    ties to the smaller id; singleton components keep themselves at the
    teleport floor."""
    # the shared graph spine (round 11): components AND the rank frame
    # are materialized once per corpus and reused across the family
    from bigbugdata_spark.operators.similarity_graph_core import (
        components,
        pagerank_frame,
    )

    comp = components(spark, sf_dir)
    pr = pagerank_frame(spark, sf_dir).select("vec_id", "pr_ppb")
    ranked = comp.join(pr, "vec_id")
    w = Window.partitionBy("component").orderBy(
        F.desc("pr_ppb"), F.asc("vec_id")
    )
    wn = Window.partitionBy("component")
    return (
        ranked.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wn))
        .where(F.col("rn") == 1)
        .select(
            "component",
            F.col("n_members").cast("long").alias("n_members"),
            F.col("vec_id").alias("exemplar_id"),
            F.col("pr_ppb").alias("exemplar_pr_ppb"),
        )
    )

"""k-NN graph construction (round 8) — every vector's KNN_K nearest
neighbors through the IVF index: the graph that feeds semantic
clustering, graph-based dedup, diversity sampling, and (at much larger
K and corpus) NN-descent-style ANN index builds. Unlike the query
family (8 fixed queries), EVERY corpus vector is a source node here —
the all-nodes workload whose cost profile is candidate generation, not
query fan-out.

No analog in the reference (SURVEY §2.1); similarity extension surface
completing sim_* (query-time) with the index-time graph build.

Approximation contract (the audits.py discipline): the oracle is NOT
ground truth — it re-derives the IDENTICAL IVF pipeline (affine-hash
codebook -> redundant assignment -> KNN_PROBE probed cells ->
candidate top-k with vec_id tie-break) in SQL, so both engines build
the same graph independently and any drift in codebook, probing or
scoring goes hash-red. Graph quality vs brute force is pinned
separately by a recall-floor test (tests/test_round8_ops.py).

Scale posture: candidates come from shared probed cells — a cell-keyed
equi-join bounded by cell occupancy, never an all-pairs product; per
node the exact scoring touches only its candidates, and the top-k is a
per-node window over that bounded set. KNN_PROBE < N_PROBE keeps the
all-nodes candidate volume at index-build levels (probing half the
cells is a query-time luxury). Sizing (r8 caveat resolved in round 9):
the codebook is corpus-scaled, K = max(16, floor sqrt(n)) — shared
with the whole registered IVF family via ivf_cents' default, and
re-derived from COUNT(*) by this oracle's cents CTE — so cell
occupancy stays ~sqrt(n) and the all-nodes candidate volume ~n^1.5
instead of the quadratic blow-up a fixed K would give.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.functions import hashing as H
from bigbugdata_spark.operators.similarity_knn_core import (  # noqa: F401
    KNN_K,
    KNN_PROBE,
    KNN_SQL,
)
from bigbugdata_spark.registry import register

# constants + the oracle SQL moved to the non-registering
# operators/similarity_knn_core.py in round 10 (shared with
# operators/similarity_keep.py without import-time registration drag).

_KNN_SQL = KNN_SQL


@register(
    "sim_knn_graph",
    oracle=_KNN_SQL,
    tags=("similarity", "join", "graph"),
)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edges (src, dst, rnk, cos_sim): each vector's KNN_K best
    IVF-candidates by cosine, rank ties broken by dst id. Nodes whose
    probed cells hold fewer than KNN_K other vectors emit fewer
    edges (never padded)."""
    # lazy import: keeps operators.similarity's registrations out of
    # this module's import-time footprint (registry rotation order)
    from bigbugdata_spark.operators.similarity import (
        _corpus,
        ivf_assign,
        ivf_candidates,
        ivf_cents,
        ivf_probes,
    )

    corpus = _corpus(spark, sf_dir)
    cents = ivf_cents(corpus)
    assign = ivf_assign(corpus, cents)
    allq = corpus.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    probes = ivf_probes(allq, cents, n_probe=KNN_PROBE)
    cand = ivf_candidates(probes, assign)
    scored = (
        cand.join(corpus, "vec_id")
        .join(allq, "query_id")
        .select(
            F.col("query_id").alias("src"),
            F.col("vec_id").alias("dst"),
            (
                H.dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_nrm") * F.col("nrm"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cos_sim"), F.asc("dst"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_K)
        .select("src", "dst", F.col("rnk").cast("long").alias("rnk"), "cos_sim")
    )

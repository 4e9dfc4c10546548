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

from pyspark.sql import DataFrame, SparkSession

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
    index_writer=True,
)
def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edges (src, dst, rnk, cos_sim): each vector's KNN_K best
    IVF-candidates by cosine, rank ties broken by dst id. Nodes whose
    probed cells hold fewer than KNN_K other vectors emit fewer
    edges (never padded).

    Served from the shared graph spine (round 11, VERDICT r10 #5): the
    plan itself lives in similarity_graph_core._build_knn_plan; this
    call returns the content-fingerprinted shared materialization that
    pagerank/triangles/components/exemplars all consume, so the
    expensive IVF build runs once per corpus, not once per consumer."""
    from bigbugdata_spark.operators.similarity_graph_core import knn_edges

    return knn_edges(spark, sf_dir)

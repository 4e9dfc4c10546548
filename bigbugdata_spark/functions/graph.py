"""Distributed connected components — the shared iterative min-label
propagation used by the clustering operators (near-dup keep decisions
in operators/dedup.py predate this helper and keep their inlined copy
under their r5 driver verdict; new graph consumers build on this).

Algorithm: every node starts labeled with itself; each round every
node adopts the minimum label among itself and its neighbors;
converges in O(component diameter) rounds. The loop is driver-
CONTROLLED but executor-EXECUTED — each round is one equi-join + agg,
localCheckpoint cuts the lineage so plans stay flat, and the
convergence check is a single count. At 100 TB both frames key on the
node id, so the per-round join co-locates on an id-bucketed layout.

Determinism: labels are min-reductions over ids — order-free exact
integers; the fixpoint is unique regardless of execution order, which
is what lets a DuckDB recursive CTE serve as the oracle for any
consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame, edges: DataFrame, id_col: str = "id"
) -> DataFrame:
    """(id, component) for every node: component = the minimum node id
    reachable through `edges` (columns a, b — assumed symmetric or
    made symmetric by the caller). Isolated nodes form their own
    singleton components."""
    both = (
        edges.select("a", "b")
        .unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint()
    while True:
        neighbor_min = (
            labels.join(both, labels.id == both.a)
            .select(F.col("b").alias("id"), F.col("component").alias("_nl"))
            .groupBy("id")
            .agg(F.min("_nl").alias("_nl"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("_nl"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") < F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels

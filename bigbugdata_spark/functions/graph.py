"""Distributed connected components — the shared alternating
large-star / small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) used by the clustering
operators (near-dup keep decisions in operators/dedup.py predate this
helper and keep their inlined copy under their r5 driver verdict; new
graph consumers build on this).

Why not plain min-label propagation (what this module shipped through
round 8): propagation needs O(component diameter) rounds — fine for
blob-shaped near-dup clusters, painful for the chain/giant components
its own consumers produce (sim_semantic_clusters' fixture has a
~483-node giant component).  Star contraction instead rewires every
node toward its neighborhood minimum each round, halving (at least)
the height of every tree per alternation: O(log n) rounds in practice
and O(log^2 n) worst case, each round two keyed join+agg pairs.

Per round, on the symmetric edge set E:
  large-star: for each node u with neighbors G(u), m = min(G(u) u {u});
              emit (v, m) for every v in G(u) with v > u.
  small-star: orient edges (high, low); for each u with lower
              neighbors N, m = min(N); emit (u, m) and (v, m) for
              v in N, v != m.
At the fixpoint E is a star forest: every non-root node holds exactly
one edge to its component's minimum id.  The loop is driver-CONTROLLED
but executor-EXECUTED — each half-round is one equi-join + min-agg on
the node id, so at 100 TB the joins co-locate on an id-bucketed
layout; localCheckpoint cuts the lineage so plans stay flat, and the
convergence check is one except+count on the canonically-oriented
edge set.

Determinism: every emitted label is a min-reduction over exact integer
ids — the fixpoint (component = min member id) is unique regardless of
execution or round order, identical to min-label propagation's, which
is what lets a DuckDB recursive CTE keep serving as the oracle for any
consumer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rounds taken by the most recent connected_components call (one
#: round = one large-star + one small-star alternation) — a test hook
#: for the O(log n) convergence claim, nothing else reads it.
LAST_ROUNDS = 0


def _large_star(sym: DataFrame) -> DataFrame:
    """Emit (v, min(G(u) u {u})) for every neighbor v > u of every node
    u of the symmetric edge frame (columns a=u, b=v)."""
    mins = sym.groupBy("a").agg(F.min("b").alias("_mn"))
    return (
        sym.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(
            F.col("b").alias("a"),
            F.least(F.col("a"), F.col("_mn")).alias("b"),
        )
    )


def _small_star(oriented: DataFrame) -> DataFrame:
    """Input edges oriented high->low (a > b). For each node a with
    lower neighborhood N: m = min(N); emit (a, m) plus (v, m) for every
    v in N except m itself. Output stays high->low oriented."""
    mins = oriented.groupBy("a").agg(F.min("b").alias("_mn"))
    rewired = (
        oriented.join(mins, "a")
        .where(F.col("b") != F.col("_mn"))
        .select(F.col("b").alias("a"), F.col("_mn").alias("b"))
    )
    centers = mins.select("a", F.col("_mn").alias("b"))
    return rewired.unionByName(centers).distinct()


def connected_components(
    nodes: DataFrame, edges: DataFrame, id_col: str = "id"
) -> DataFrame:
    """(id, component) for every node: component = the minimum node id
    reachable through `edges` (columns a, b — symmetry not required;
    both orientations are derived here). Isolated nodes form their own
    singleton components."""
    global LAST_ROUNDS
    # canonical high->low orientation, self-loops dropped
    e = (
        edges.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    LAST_ROUNDS = 0
    while True:
        sym = e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        grown = _large_star(sym)
        oriented = (
            grown.select(
                F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
            )
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        new_e = _small_star(oriented).localCheckpoint()
        LAST_ROUNDS += 1
        # converged when the canonical edge set is unchanged: counts
        # equal and no new edge outside the old set (both frames are
        # distinct high->low pairs, so this equality is exact)
        if (
            new_e.count() == e.count()
            and new_e.exceptAll(e).limit(1).count() == 0
        ):
            e = new_e
            break
        e = new_e
    # fixpoint is a star forest; min-agg guards the (impossible at
    # fixpoint, cheap anyway) multi-parent case
    roots = e.groupBy("a").agg(F.min("b").alias("_root"))
    return (
        nodes.select(F.col(id_col).alias("id"))
        .join(roots, F.col("id") == F.col("a"), "left")
        .select(
            "id", F.coalesce(F.col("_root"), F.col("id")).alias("component")
        )
    )

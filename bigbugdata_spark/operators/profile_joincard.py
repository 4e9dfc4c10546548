"""Join-cardinality estimate card (round 10) — the EXACT pre-flight
answer to "how big is this join?": for the user-activity enrichment
join events.user_id = orders.o_custkey, the per-side row/key counts,
the key overlap, the exact join output size (sum over common keys of
the per-key count product — computed WITHOUT running the join), and
the single worst key's contribution.  With prof_key_skew this
completes the shuffle-planning pair: skew tells you how to salt, this
card tells you what the join will cost and which key dominates it.

No analog in the reference (SURVEY §2.1); profiling extension surface.

Determinism: BIGINT end-to-end (counts, products, sums); the worst-key
pick is total-ordered (contribution DESC, key ASC).

Scale posture: each side collapses to its key-cardinality frame with
ONE map-side-combinable groupBy; the key-frame equi-join shuffles
key-sized (not row-sized) data, so the quadratic blow-up the card
PREDICTS never has to be materialized to measure it.  The worst-key
pick is orderBy+limit -> TakeOrderedAndProject over the key frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.diagnostics import join_cardinality
from bigbugdata_spark.registry import register

_JOINCARD_SQL = """
    WITH c1 AS (
        SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n1
        FROM events GROUP BY user_id
    ),
    c2 AS (
        SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n2
        FROM orders GROUP BY o_custkey
    ),
    j AS (
        SELECT c1.k, n1, n2, n1 * n2 AS contrib
        FROM c1 JOIN c2 ON c1.k = c2.k
    ),
    lt AS (
        SELECT CAST(SUM(n1) AS BIGINT) AS n_left,
               CAST(COUNT(*) AS BIGINT) AS n_left_keys
        FROM c1
    ),
    rt AS (
        SELECT CAST(SUM(n2) AS BIGINT) AS n_right,
               CAST(COUNT(*) AS BIGINT) AS n_right_keys
        FROM c2
    ),
    jt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_common_keys,
               CAST(COALESCE(SUM(contrib), 0) AS BIGINT) AS join_rows
        FROM j
    ),
    worst AS (
        SELECT k AS max_key, contrib AS max_key_rows
        FROM j ORDER BY contrib DESC, k ASC LIMIT 1
    )
    SELECT n_left, n_left_keys, n_right, n_right_keys,
           n_common_keys, join_rows, max_key, max_key_rows
    FROM lt, rt, jt LEFT JOIN worst ON TRUE
"""


@register(
    "prof_join_cardinality",
    oracle=_JOINCARD_SQL,
    tags=("profile", "join"),
)
def prof_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n_left, n_left_keys, n_right, n_right_keys,
    n_common_keys, join_rows, max_key, max_key_rows) — the exact output
    size and worst-key contribution of the events-x-orders enrichment
    join, derived from per-key counts without executing the join (the
    generic core, usable on any table pair, is
    functions.diagnostics.join_cardinality)."""
    return join_cardinality(
        table(spark, sf_dir, "events"),
        "user_id",
        table(spark, sf_dir, "orders"),
        "o_custkey",
    )

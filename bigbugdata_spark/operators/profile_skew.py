"""Key-skew profile (round 10) — the pre-shuffle diagnostic card for a
join/aggregation key: the top heavy-hitter keys with their exact share
and cumulative share of all rows, next to the key-space size.  This is
the card an engineer reads BEFORE keying a 100 TB shuffle on a column
(and the input to choosing a salting factor or an AQE skew threshold);
it complements dq_volume_anomaly (volume over time) and
text_heavy_hitters_cms (approximate, content-domain) with an exact,
key-domain answer.

No analog in the reference (SURVEY §2.1); profiling extension surface.

Determinism: counts and cumulative counts are BIGINT end-to-end; the
only doubles are single divisions of two BIGINTs (IEEE-identical in
both engines).  The top-K ordering (cnt DESC, key ASC) is total.

Scale posture: ONE map-side-combinable groupBy over the key (the frame
after it is key-cardinality-sized, not row-sized), a 2-row global
aggregate broadcast back, and top-K via orderBy+limit ->
TakeOrderedAndProject (each partition keeps K rows; no full sort, no
unpartitioned vocabulary-wide window — the rank/cumsum window runs on
the K-row post-limit frame only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.diagnostics import key_skew
from bigbugdata_spark.registry import register

TOP_KEYS = 25

_SKEW_SQL = f"""
    WITH counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(cnt) AS BIGINT) AS n_rows
        FROM counts
    ),
    top AS (
        SELECT user_id, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id ASC) AS rnk,
               SUM(cnt) OVER (
                   ORDER BY cnt DESC, user_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_cnt
        FROM counts
        ORDER BY cnt DESC, user_id ASC
        LIMIT {TOP_KEYS}
    )
    SELECT CAST(rnk AS BIGINT) AS rnk,
           user_id,
           cnt,
           cnt / CAST(n_rows AS DOUBLE) AS share,
           CAST(cum_cnt AS BIGINT) / CAST(n_rows AS DOUBLE) AS cum_share,
           n_keys,
           n_rows
    FROM top, tot
"""


@register(
    "prof_key_skew",
    oracle=_SKEW_SQL,
    tags=("profile", "skew"),
)
def prof_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rnk, user_id, cnt, share, cum_share, n_keys, n_rows): the
    TOP_KEYS heaviest keys of events.user_id with exact row shares and
    the key-space totals — the shuffle-planning skew card (the generic
    core, usable on any table/key, is functions.diagnostics.key_skew)."""
    return key_skew(
        table(spark, sf_dir, "events"), "user_id", top=TOP_KEYS
    )

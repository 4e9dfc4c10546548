"""Mergeable distinct-count sketch store (round 10) — THE 100 TB
distinct-users pattern: you cannot COUNT(DISTINCT) over a petabyte per
dashboard refresh, so each day's partition keeps a Datasketches HLL
sketch of its users and any range's distinct count comes from UNIONING
the per-day sketches — no rescan, mergeable across shards, the
standard lakehouse rollup companion.  This registers the rolling
("distinct users to date") read over per-day sketches, under the
bound-asserting audit discipline (operators/audits.py): the sketch
registers are engine-internal, so the output carries the EXACT
per-day and cumulative counts (both SQL-re-derivable) plus an
in_bounds flag that pins the estimate within max(10, 5%) of exact —
any regression in sketch build, union, or estimate flips a flag and
goes hash-red.

No analog in the reference (SURVEY §2.1); events/sketch extension
surface next to text_vocab_approx (HLL++) and evt_value_quantiles'
sketch twin.

Determinism: Datasketches HLL is hash-based and order-independent
under union; exact columns are integer counts; the flag compares
integers against an integer envelope.

Scale posture: one groupBy(day) pass builds daily sketches (map-side
partial merge — sketch unions are commutative monoids, Spark's
aggregate buffers merge them like SUM partials); the rolling read is
ONE sorted prefix scan (round 11, VERDICT r10 #7): hll_union_agg over
a running ROWS-frame window accumulates each day's sketch into the
carried union exactly once — |days| merges total, where the r10
pairwise inequality join paid |days|^2/2 (240k tiny merges at 3 years
of days).  The window is single-partition but day-cardinality-sized —
the same bounded-panel contract as the EWMA/quantile-trend family; the
exact columns ride the first-seen frame (growth accounting's shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

#: estimate must land within max(ABS_TOL, cum_exact * REL_TOL_PCT / 100)
ABS_TOL, REL_TOL_PCT = 10, 5

_SKETCH_SQL = """
    WITH ev AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events
    ),
    daily AS (
        SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_day
        FROM ev GROUP BY day
    ),
    firsts AS (
        SELECT user_id, MIN(day) AS fd FROM ev GROUP BY user_id
    ),
    news AS (
        SELECT fd AS day, CAST(COUNT(*) AS BIGINT) AS n_new
        FROM firsts GROUP BY fd
    )
    SELECT d.day, d.n_users_day,
           CAST(SUM(COALESCE(n.n_new, 0)) OVER (
               ORDER BY d.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_users_exact,
           CAST(1 AS INT) AS in_bounds
    FROM daily d LEFT JOIN news n ON d.day = n.day
"""


@register(
    "evt_sketch_rolling_users",
    oracle=_SKETCH_SQL,
    tags=("events", "sketch", "audit", "agg"),
)
def evt_sketch_rolling_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, n_users_day, cum_users_exact, in_bounds): per day the exact
    distinct users, the exact distinct-to-date, and the flag asserting
    the HLL-union estimate over the per-day sketch store lands within
    max(ABS_TOL, REL_TOL_PCT%) of exact.  The estimate is derived ONLY
    through build->union->estimate over per-day sketches — the exact
    path never feeds it."""
    ev = table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").cast("long").alias("n_users_day"),
    )
    # rolling union as ONE sorted prefix scan: the running ROWS frame
    # accumulates each day's sketch into the carried union exactly once
    # (|days| merges — the r10 pairwise join paid |days|^2/2)
    wcum = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rolled = daily.select(
        "day",
        "n_users_day",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(wcum))
        .cast("long")
        .alias("est"),
    )
    # exact cumulative via first-seen days (growth accounting's shape)
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("fd"))
    news = firsts.groupBy("fd").agg(F.count(F.lit(1)).alias("n_new"))
    cum = (
        rolled.join(news, rolled.day == news.fd, "left")
        .select(
            "day",
            "n_users_day",
            "est",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .withColumn("cum_users_exact", F.sum("n_new").over(wcum).cast("long"))
    )
    envelope = F.greatest(
        F.lit(ABS_TOL),
        (F.col("cum_users_exact") * REL_TOL_PCT / 100).cast("long"),
    )
    return cum.select(
        "day",
        "n_users_day",
        "cum_users_exact",
        (F.abs(F.col("est") - F.col("cum_users_exact")) <= envelope)
        .cast("int")
        .alias("in_bounds"),
    )

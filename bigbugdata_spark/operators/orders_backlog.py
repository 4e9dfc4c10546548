"""Open-order backlog via sweep-line prefix sums (round 10) — an
operator SHAPE the engine didn't have yet: "how many intervals cover
each point in time" answered with +1/-1 boundary deltas and one
cumulative sum, NOT a per-day range join.  Each order is open from its
order date until its last lineitem ships; the backlog curve (open
orders at every boundary day) is the ops view of fulfillment debt.

Why the shape matters at 100 TB: the naive formulation joins a day
dimension against the interval table on day BETWEEN start AND end —
cost |days| x |intervals| candidate pairs (billions x thousands).  The
sweep-line emits exactly TWO delta rows per interval, aggregates them
by day (map-side combinable), and one ordered cumulative sum over the
distinct-boundary-day frame (date-domain bounded, the growth-accounting
window shape) yields every day's open count.  Linear in intervals,
ordered work bounded by the calendar.

No analog in the reference (SURVEY §2.1); orders/events extension
surface next to evt_range_join (which keeps the join shape for the
cases that NEED pairing, not counting).

Determinism: dates format to strings on both engines; counts are exact
integers; orders with no lineitems never open (the RI-orphan case
dq_referential_integrity reports).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

_BACKLOG_SQL = """
    WITH iv AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS start_d,
               CAST(MAX(l.l_shipdate) AS DATE) AS end_d
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
        SELECT strftime(start_d, '%Y-%m-%d') AS day, 1 AS delta FROM iv
        UNION ALL
        SELECT strftime(end_d + INTERVAL 1 DAY, '%Y-%m-%d'), -1 FROM iv
    ),
    by_day AS (
        SELECT day, CAST(SUM(delta) AS BIGINT) AS net_change
        FROM deltas GROUP BY day
    )
    SELECT day, net_change,
           CAST(SUM(net_change) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS open_orders
    FROM by_day
"""


@register(
    "orders_open_backlog",
    oracle=_BACKLOG_SQL,
    tags=("orders", "events", "window", "agg"),
)
def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, net_change, open_orders) at every interval boundary day:
    the number of orders open (placed, not yet fully shipped) after
    that day's openings and closings — two delta rows per order, one
    calendar-bounded cumulative sum."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("start_d")
    )
    ship = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("end_d"))
    )
    iv = orders.join(ship, orders.o_orderkey == ship.l_orderkey)
    deltas = iv.select(
        F.date_format("start_d", "yyyy-MM-dd").alias("day"),
        F.lit(1).alias("delta"),
    ).unionByName(
        iv.select(
            F.date_format(F.date_add("end_d", 1), "yyyy-MM-dd").alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    by_day = deltas.groupBy("day").agg(
        F.sum("delta").cast("long").alias("net_change")
    )
    wcum = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return by_day.withColumn(
        "open_orders", F.sum("net_change").over(wcum).cast("long")
    )

"""Shared, NON-REGISTERING core of the freshness audit — the feed
table, the per-feed DuckDB SQL fragment, and the finish tail shared by
the batch audit (operators/dq_fresh.py) and the live streaming monitor
(streaming/freshness.py).  Split out in round 10 so streaming.freshness
can hold an in-cap registry slot without dragging dq_fresh's
freshly-green registration forward (the scd_core.py treatment; see
registry.py's rotation comment).

No analog in the reference (SURVEY §2.1); dq extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigbugdata_spark.functions.fragments import TS_FMT, TS_FMT_DUCK

US_PER_HOUR = 3_600_000_000

# (feed, ts column, anchor "now", staleness SLA in hours)
FRESHNESS_FEEDS = (
    ("events", "ts", "2024-01-31 00:00:00", 24),
    ("orders", "o_orderdate", "2001-09-01 00:00:00", 168),
)


def feed_sql(tbl: str, col: str, anchor: str, sla: int) -> str:
    """One feed's freshness row as DuckDB SQL (shared between the batch
    audit's oracle and the live monitor's)."""
    return f"""
    SELECT '{tbl}' AS feed,
           strftime(MAX({col}), '{TS_FMT_DUCK}') AS max_ts,
           (epoch_us(TIMESTAMP '{anchor}') - epoch_us(MAX({col})))
               // {US_PER_HOUR} AS lag_hours,
           CAST((epoch_us(TIMESTAMP '{anchor}') - epoch_us(MAX({col})))
               // {US_PER_HOUR} > {sla} AS INT) AS is_stale
    FROM {tbl}
    """


def finish_freshness(
    agg: "DataFrame", tbl: str, anchor: str, sla: int
) -> "DataFrame":
    """Freshness card row from a one-row MAX aggregate (column
    max_ts_raw) — the shared tail of the batch audit and the live
    streaming monitor, so the two cannot drift."""
    lag_hours = F.expr(
        f"(unix_micros(TIMESTAMP '{anchor}') - unix_micros(max_ts_raw))"
        f" div {US_PER_HOUR}"
    )
    return agg.select(
        F.lit(tbl).alias("feed"),
        F.date_format("max_ts_raw", TS_FMT).alias("max_ts"),
        lag_hours.alias("lag_hours"),
        (lag_hours > sla).cast("int").alias("is_stale"),
    )

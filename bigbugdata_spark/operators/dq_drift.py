"""Categorical distribution-drift monitor (round 8) — the third leg of
the dq time-series family (dq_ext: volume anomaly, PK uniqueness): does
the MIX of event types in the current window differ from the reference
window, even when total volume looks fine? The production shape is
"clicks still arrive, but the error share doubled" — a feed can pass
volume checks while its composition silently shifts.

No analog in the reference (SURVEY §2.1); dq extension surface.

Determinism discipline: the drift FLAG is decided entirely in integer
arithmetic — |c_cur*n_ref - c_ref*n_cur| * 1000 > THRESHOLD_PM *
n_ref * n_cur — i.e. the permille share delta compared exactly by
cross-multiplication, no floating point anywhere near the decision.
The products run in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): the
cross-multiplication squares the window totals, so BIGINT would wrap
at ~1e8 events per window — far below a 100 TB feed. 38 digits carry
the comparison exactly to ~1e17 events per window; only the 0/1 flag
leaves the wide type, so cross-engine hashing never sees it. The
reported delta_pm is a fixed fp64 expression over exact BIGINTs
(identical in both engines). Counts are conditional sums in ONE scan
(no per-window scans + outer join), so a category absent from either
window still gets a row with an exact zero.

The streaming twin (streaming/drift.py) composes the two builders
below — `window_counts` and `finish_drift` — so the live monitor and
this batch audit share one expression tree and cannot drift apart.

Scale posture: one map-side-combinable aggregate on event_type
(|event_type| rows out of 100 TB); window totals roll up the tiny
result frame, not the source. At 100 TB with the date-partitioned lake
the two-window filter is partition pruning, not a full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.registry import register

# window boundary: [data start, CUTOFF) = reference, [CUTOFF, end) = current
DRIFT_CUTOFF = "2024-01-16 00:00:00"
# share shift that trips the flag, in permille of the window total
DRIFT_THRESHOLD_PM = 10

DRIFT_ORACLE_SQL = f"""
    WITH counts AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{DRIFT_CUTOFF}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
               CAST(SUM(CASE WHEN ts >= TIMESTAMP '{DRIFT_CUTOFF}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS c_cur
        FROM events GROUP BY event_type
    ),
    tot AS (
        SELECT event_type, c_ref, c_cur,
               CAST(SUM(c_ref) OVER () AS BIGINT) AS n_ref,
               CAST(SUM(c_cur) OVER () AS BIGINT) AS n_cur
        FROM counts
    )
    SELECT event_type, c_ref, c_cur, n_ref, n_cur,
           CASE WHEN n_ref > 0 AND n_cur > 0 THEN
               (CAST(c_cur AS DOUBLE) / n_cur - CAST(c_ref AS DOUBLE) / n_ref)
                   * 1000
           END AS delta_pm,
           CAST(abs(CAST(c_cur AS HUGEINT) * n_ref
                    - CAST(c_ref AS HUGEINT) * n_cur) * 1000
                > CAST({DRIFT_THRESHOLD_PM} AS HUGEINT) * n_ref * n_cur
                AS INT) AS drift
    FROM tot
"""

_DEC = "decimal(38,0)"  # Spark's HUGEINT stand-in for the flag products


def window_counts(ev: DataFrame) -> DataFrame:
    """Per event_type, conditional counts on each side of the cutoff —
    one pass, map-side combinable, streaming-safe (shared with the live
    monitor in streaming/drift.py)."""
    cutoff = F.lit(DRIFT_CUTOFF).cast("timestamp")
    return ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("ts") < cutoff, 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("ts") >= cutoff, 1).otherwise(0)).alias("c_cur"),
    )


def finish_drift(counts: DataFrame) -> DataFrame:
    """Totals + permille delta + exact-integer flag over the tiny
    per-category frame (batch tail of both the batch and streaming
    drift queries)."""
    w = Window.partitionBy()  # |event_type|-row frame: totals roll up in place
    counts = counts.select(
        "event_type",
        "c_ref",
        "c_cur",
        F.sum("c_ref").over(w).alias("n_ref"),
        F.sum("c_cur").over(w).alias("n_cur"),
    )
    # NULL (not NaN/Infinity) when either window is still empty — the
    # live streaming monitor hits n_cur = 0 before any current-window
    # event arrives, and engines canonicalize the degenerate division
    # differently (r8 advisory); the integer flag stays 0 either way.
    delta_pm = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        (
            F.col("c_cur").cast("double") / F.col("n_cur")
            - F.col("c_ref").cast("double") / F.col("n_ref")
        )
        * 1000,
    )
    drift = (
        F.abs(
            F.col("c_cur").cast(_DEC) * F.col("n_ref")
            - F.col("c_ref").cast(_DEC) * F.col("n_cur")
        )
        * 1000
        > F.lit(DRIFT_THRESHOLD_PM).cast(_DEC) * F.col("n_ref") * F.col("n_cur")
    )
    return counts.select(
        "event_type",
        "c_ref",
        "c_cur",
        "n_ref",
        "n_cur",
        delta_pm.alias("delta_pm"),
        drift.cast("int").alias("drift"),
    )


@register(
    "dq_distribution_drift",
    oracle=DRIFT_ORACLE_SQL,
    tags=("dq", "events", "agg"),
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: reference- and current-window counts, window
    totals, the share delta in permille, and an exact-integer drift flag
    (share moved by more than DRIFT_THRESHOLD_PM permille)."""
    return finish_drift(window_counts(table(spark, sf_dir, "events")))

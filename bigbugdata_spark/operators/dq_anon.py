"""k-anonymity audit (round 10) — the privacy-governance check the dq
family lacked: before events (or any interaction log) feed a training
corpus, how identifying are the quasi-identifier combinations?  A
(event_type, day, value-band) cell that only one or two users occupy
re-identifies them by simple lookup; the standard release gate demands
every occupied QI cell hold at least K_ANON rows, and the remediation
(suppress or coarsen the small cells) needs exactly this accounting:
per event_type, how many QI cells exist, how many are below k, how
many rows they expose, and the worst cell's size.

No analog in the reference (SURVEY §2.1); dq/governance extension
surface next to text_scrub (redaction) and the decontamination gates.

Determinism: group sizes, counts, minima — exact integers; the value
band is exact-cents integer division.

Scale posture: one map-side-combinable groupBy over the QI key (the
shuffle spreads across the full QI space), then a |cells|-sized rollup
to |event_type| rows.  At 100 TB the QI cell count, not the row count,
bounds everything after the first aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL
from bigbugdata_spark.registry import register

K_ANON = 5
BAND_CENTS = 1000  # value coarsening: 10-currency-unit bands

_ANON_SQL = f"""
    WITH cells AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               {CENTS_SQL} // {BAND_CENTS} AS band,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type, day, band
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_small_cells,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk,
           CAST(MIN(n) AS BIGINT) AS min_cell_size,
           CAST(SUM(n) AS BIGINT) AS n_rows
    FROM cells GROUP BY event_type
"""


@register(
    "dq_k_anonymity",
    oracle=_ANON_SQL,
    tags=("dq", "agg"),
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: occupied (day, value-band) QI cells, cells below
    K_ANON, rows those small cells expose, the worst cell's size, and
    total rows — the privacy release gate's remediation accounting."""
    cells = (
        table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            # SQL `div` = exact integer division (the dq_fresh-proven
            # twin of DuckDB //), no fp64 quotient anywhere
            F.expr(
                f"CAST(ROUND(value * 100) AS BIGINT) div {BAND_CENTS}"
            ).alias("band"),
        )
        .groupBy("event_type", "day", "band")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    small = F.col("n") < K_ANON
    return cells.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(small.cast("long")).alias("n_small_cells"),
        F.sum(F.when(small, F.col("n")).otherwise(0)).alias("n_rows_at_risk"),
        F.min("n").alias("min_cell_size"),
        F.sum("n").alias("n_rows"),
    )

"""Z-ordered lake accounting under the driver's hash gate (round 9,
VERDICT r8 #5) — the Z-order clustering (sources/zorder.py) was proven
only by row-group-statistics layout tests; this registers a query that
WRITES the events table Z-ORDERED BY (user_id, cents) and reads the
accounting back THROUGH the layout, grouped by fixed-width Morton-key
ranges, with a DuckDB twin that re-derives the identical bit-interleave
in SQL over the original table.  The hash compare therefore gates BOTH
halves: the write+read round trip must preserve every row, and the
Morton arithmetic (range normalization in fp64, 16-bit interleave)
must agree bit-for-bit across engines.

The non-SQL half of the layout contract — each output file owns a
contiguous, pairwise-disjoint z-range (what repartitionByRange buys
over round-robin) — is asserted IN the query over the input_file_name
read-back (n_files rows, bounded collect), so a regression becomes an
errored driver row; per-row-group min/max narrowing stays quantified in
tests/test_zorder.py.

No analog in the reference (SURVEY §2.1); storage extension surface.
Like corpus_version_diff / evt_partitioned_lake_accounting this is an
O(write) verification query, excluded from the bench headline set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL, cents_col
from bigbugdata_spark.registry import register
from bigbugdata_spark.sources.zorder import MORTON_BITS, with_morton

_N_FILES = 4
#: top bits of the 2*MORTON_BITS-wide key -> 64 fixed-width z ranges
_BUCKET_SHIFT = 2 * MORTON_BITS - 6


def _sql_norm(col: str, lo: str, hi: str) -> str:
    """DuckDB twin of zorder._normalize — same fp64 order of ops."""
    top = (1 << MORTON_BITS) - 1
    return (
        f"LEAST(GREATEST(CAST(FLOOR(((CAST({col} AS DOUBLE) - {lo}) * {top})"
        f" / GREATEST({hi} - {lo}, 1.0)) AS BIGINT), 0), {top})"
    )


def _sql_morton(nx: str, ny: str) -> str:
    """DuckDB twin of zorder.morton_key: bit i of nx -> 2i, ny -> 2i+1."""
    terms = []
    for i in range(MORTON_BITS):
        terms.append(f"((({nx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ny} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


ZORDER_ORACLE_SQL = f"""
    WITH src AS (
        SELECT user_id, {CENTS_SQL} AS cents FROM events
    ),
    bounds AS (
        SELECT CAST(MIN(user_id) AS DOUBLE) AS xlo,
               CAST(MAX(user_id) AS DOUBLE) AS xhi,
               CAST(MIN(cents) AS DOUBLE) AS ylo,
               CAST(MAX(cents) AS DOUBLE) AS yhi
        FROM src
    ),
    keyed AS (
        SELECT user_id, cents,
               ({_sql_morton(_sql_norm('user_id', 'xlo', 'xhi'),
                             _sql_norm('cents', 'ylo', 'yhi'))}) AS z
        FROM src, bounds
    )
    SELECT z >> {_BUCKET_SHIFT} AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(user_id) AS BIGINT) AS min_user,
           CAST(MAX(user_id) AS BIGINT) AS max_user,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM keyed GROUP BY z_bucket
"""


@register(
    "evt_zorder_lake_accounting",
    oracle=ZORDER_ORACLE_SQL,
    tags=("events", "storage", "agg"),
    side_effects=True,
)
def evt_zorder_lake_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events Z-ORDERED BY (user_id, cents) and report per
    fixed-width z-range: row count, both columns' min/max, and the cents
    total — READ BACK through the layout, so a row lost or corrupted by
    the z-write fails the value-hash compare, and any engine divergence
    in the Morton arithmetic shifts rows across buckets and fails it
    too.  In-query assertion: the landed files' z-ranges are pairwise
    disjoint (the file-level-pruning property range partitioning pays
    for); violation raises -> errored driver row."""
    import shutil
    import tempfile

    from bigbugdata_spark.sources.zorder import write_zordered

    base = tempfile.mkdtemp(prefix="bigbugdata-zlake-")
    try:
        src = table(spark, sf_dir, "events").select(
            "user_id", cents_col().alias("cents")
        )
        lake = f"{base}/events_z"
        write_zordered(src, lake, "user_id", "cents", n_files=_N_FILES)
        # input_file_name must bind BEFORE with_morton's bounds
        # cross-join makes the plan multi-source
        back = with_morton(
            spark.read.parquet(lake).withColumn("_f", F.input_file_name()),
            "user_id",
            "cents",
        )
        # bounded collect: one row per landed file
        spans = (
            back.groupBy("_f")
            .agg(F.min("_z").alias("zlo"), F.max("_z").alias("zhi"))
            .collect()
        )
        iv = sorted((r["zlo"], r["zhi"]) for r in spans)
        for (_, prev_hi), (lo, _) in zip(iv, iv[1:]):
            if lo <= prev_hi:
                raise RuntimeError(
                    f"z-ranges overlap across files: {iv} — "
                    "range partitioning regressed to interleaved layout"
                )
        out = (
            back.groupBy(
                F.shiftright("_z", _BUCKET_SHIFT).alias("z_bucket")
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("user_id").alias("min_user"),
                F.max("user_id").alias("max_user"),
                F.min("cents").alias("min_cents"),
                F.max("cents").alias("max_cents"),
                F.sum("cents").alias("sum_cents"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)

"""N-column Z-order under the driver's hash gate (round 10, VERDICT r9
#5) — evt_zorder_lake_accounting proves the TWO-column Morton path
end-to-end; this registers its three-axis sibling over the N-column
generalization (sources/zorder.py morton_key_n / write_zordered_n,
previously layout-tested only): WRITE events Z-ORDERED BY (user_id,
cents, hour) and read the accounting back THROUGH the layout, grouped
by fixed-width z-ranges, with a DuckDB twin that re-derives the
round-robin 3-way bit interleave in SQL over the original table.  The
hash compare gates the write+read round trip AND the N-column Morton
arithmetic (fp64 range normalization at the n-adjusted bit budget,
bit i of column j -> i*3+j) bit-for-bit across engines.

The third axis is the event's whole hour (unix_micros // 3.6e9 —
integer microsecond arithmetic, the dq_fresh-proven engine-exact
time derivation), so the key covers the who/how-much/when triple a
real event-lake scan actually filters on.

The non-SQL half of the layout contract — each landed file owns a
contiguous, pairwise-disjoint z-range — is asserted IN the query over
the input_file_name read-back (n_files rows, bounded collect);
three-axis row-group narrowing stays quantified in tests/test_zorder.py.

No analog in the reference (SURVEY §2.1); storage extension surface.
O(write) verification query, excluded from the bench headline set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.fragments import CENTS_SQL, cents_col
from bigbugdata_spark.registry import register
from bigbugdata_spark.sources.zorder import MORTON_BITS

_COLS = ("user_id", "cents", "hour")
_N = len(_COLS)
#: sources/zorder.with_morton_n's bit budget for n=3
_BITS = min(MORTON_BITS, 62 // _N)
_N_FILES = 4
#: top bits of the N*_BITS-wide key -> 64 fixed-width z ranges
_BUCKET_SHIFT = _N * _BITS - 6

_US_PER_HOUR = 3_600_000_000


def _sql_norm(col: str, lo: str, hi: str) -> str:
    """DuckDB twin of with_morton_n's normalization — same fp64 order
    of ops at the n-adjusted bit budget."""
    top = (1 << _BITS) - 1
    return (
        f"LEAST(GREATEST(CAST(FLOOR(((CAST({col} AS DOUBLE) - {lo}) * {top}.0)"
        f" / GREATEST({hi} - {lo}, 1.0)) AS BIGINT), 0), {top})"
    )


def _sql_morton_n(normed: tuple[str, ...]) -> str:
    """DuckDB twin of zorder.morton_key_n: bit i of column j lands at
    i*n + j."""
    n = len(normed)
    terms = []
    for i in range(_BITS):
        for j, c in enumerate(normed):
            terms.append(f"((({c} >> {i}) & 1) << {i * n + j})")
    return " | ".join(terms)


ZORDER3_ORACLE_SQL = f"""
    WITH src AS (
        SELECT user_id, {CENTS_SQL} AS cents,
               epoch_us(ts) // {_US_PER_HOUR} AS hour
        FROM events
    ),
    bounds AS (
        SELECT CAST(MIN(user_id) AS DOUBLE) AS xlo,
               CAST(MAX(user_id) AS DOUBLE) AS xhi,
               CAST(MIN(cents) AS DOUBLE) AS ylo,
               CAST(MAX(cents) AS DOUBLE) AS yhi,
               CAST(MIN(hour) AS DOUBLE) AS tlo,
               CAST(MAX(hour) AS DOUBLE) AS thi
        FROM src
    ),
    keyed AS (
        SELECT user_id, cents, hour,
               ({_sql_morton_n((_sql_norm('user_id', 'xlo', 'xhi'),
                                _sql_norm('cents', 'ylo', 'yhi'),
                                _sql_norm('hour', 'tlo', 'thi')))}) AS z
        FROM src, bounds
    )
    SELECT z >> {_BUCKET_SHIFT} AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(user_id) AS BIGINT) AS min_user,
           CAST(MAX(user_id) AS BIGINT) AS max_user,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents,
           CAST(MIN(hour) AS BIGINT) AS min_hour,
           CAST(MAX(hour) AS BIGINT) AS max_hour,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM keyed GROUP BY z_bucket
"""


@register(
    "evt_zorder3_lake_accounting",
    oracle=ZORDER3_ORACLE_SQL,
    tags=("events", "storage", "agg"),
    side_effects=True,
)
def evt_zorder3_lake_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Write events Z-ORDERED BY (user_id, cents, hour) through the
    N-column generalization and report per fixed-width z-range: row
    count, all three axes' min/max, and the cents total — read back
    through the layout, so a row lost by the z-write or any engine
    divergence in the 3-way interleave fails the value-hash compare.
    In-query assertion: landed files' z-ranges are pairwise disjoint."""
    import shutil
    import tempfile

    from bigbugdata_spark.sources.zorder import with_morton_n, write_zordered_n

    base = tempfile.mkdtemp(prefix="bigbugdata-zlake3-")
    try:
        src = table(spark, sf_dir, "events").select(
            "user_id",
            cents_col().alias("cents"),
            # SQL `div` = exact integer division (dq_fresh's proven
            # twin of DuckDB //) — no fp64 quotient anywhere
            F.expr(
                f"unix_micros(CAST(ts AS TIMESTAMP)) div {_US_PER_HOUR}"
            ).alias("hour"),
        )
        lake = f"{base}/events_z3"
        write_zordered_n(src, lake, list(_COLS), n_files=_N_FILES)
        # input_file_name must bind BEFORE with_morton_n's bounds
        # cross-join makes the plan multi-source
        back = with_morton_n(
            spark.read.parquet(lake).withColumn("_f", F.input_file_name()),
            list(_COLS),
        )
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
                F.min("hour").alias("min_hour"),
                F.max("hour").alias("max_hour"),
                F.sum("cents").alias("sum_cents"),
            )
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)

"""Z-order (Morton) clustering (round 8) — multi-dimensional data
skipping for the lake: single-column `cluster_by`
(sources/partitioned.py) gives perfect row-group pruning on ONE
column and none on any other; interleaving the bits of two columns
into a Morton key and sorting by THAT gives partial pruning on BOTH —
the standard lakehouse Z-ORDER BY, here as a plain Spark expression
(shiftleft/shiftright/bitwiseAND — whole-stage-codegen JVM arithmetic,
no UDF) feeding the same sortWithinPartitions write path.

Layout-only capability: like cluster_by it never changes content
(tests checksum it), so there is no oracle — the proof is pyarrow
row-group statistics: after a Z-ordered write, BOTH columns' per-row-
group min/max spans narrow versus the unclustered baseline, where a
single-column sort narrows only its own column
(tests/test_zorder.py quantifies both claims).

Scale posture: the Morton key is a per-row expression; the sort is the
same per-write-task sortWithinPartitions the single-column clustering
uses (no extra shuffle beyond the layout repartition the caller
already does). Bit budget: MORTON_BITS bits per column (values are
range-normalized first, so arbitrary int domains fit); 2*MORTON_BITS
<= 62 keeps the key in a BIGINT.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MORTON_BITS = 16


def _normalize(col: Column, lo: Column, hi: Column) -> Column:
    """Map [lo, hi] onto [0, 2^MORTON_BITS): fp64 range scaling,
    clamped into the bit budget. Deliberately double arithmetic — an
    integer cross-multiplication would overflow BIGINT for spans
    beyond ~2^47 ((col-lo) * 65535), and a layout key only needs a
    monotone binning, not exactness (floor of a monotone map is
    monotone). Precision caveat: spans beyond 2^53 bin at fp64
    granularity — adjacent values may share a bin, which costs nothing
    (they sort adjacently anyway). Subtraction happens in double, so
    extreme lo/hi pairs cannot wrap."""
    lo_d, hi_d = lo.cast("double"), hi.cast("double")
    span = F.greatest(hi_d - lo_d, F.lit(1.0))
    scaled = ((col.cast("double") - lo_d) * F.lit((1 << MORTON_BITS) - 1)) / span
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)),
        F.lit((1 << MORTON_BITS) - 1),
    )


def morton_key(x: Column, y: Column) -> Column:
    """Interleave the low MORTON_BITS of two normalized columns:
    bit i of x -> bit 2i, bit i of y -> bit 2i+1. Pure JVM bit
    arithmetic, codegen-friendly."""
    terms = []
    for i in range(MORTON_BITS):
        xi = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        yi = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        terms.append(xi)
        terms.append(yi)
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def with_morton(
    df: DataFrame, col_x: str, col_y: str, key_col: str = "_z"
) -> DataFrame:
    """Add the Morton key of (col_x, col_y), range-normalizing both
    columns from their observed min/max (one tiny aggregate, broadcast
    back as a literal-free cross join)."""
    bounds = df.agg(
        F.min(col_x).cast("long").alias("_xlo"),
        F.max(col_x).cast("long").alias("_xhi"),
        F.min(col_y).cast("long").alias("_ylo"),
        F.max(col_y).cast("long").alias("_yhi"),
    )
    widened = df.crossJoin(F.broadcast(bounds))
    nx = _normalize(F.col(col_x).cast("long"), F.col("_xlo"), F.col("_xhi"))
    ny = _normalize(F.col(col_y).cast("long"), F.col("_ylo"), F.col("_yhi"))
    return widened.withColumn(key_col, morton_key(nx, ny)).drop(
        "_xlo", "_xhi", "_ylo", "_yhi"
    )


def morton_key_n(cols: list[Column], bits: int) -> Column:
    """N-column Morton interleave: bit i of column j lands at
    i*len(cols) + j — the round-robin generalization of morton_key
    (round 9).  Pure JVM bit arithmetic; callers pick `bits` so
    bits*len(cols) <= 62 keeps the key in a BIGINT."""
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def with_morton_n(
    df: DataFrame, cols: list[str], key_col: str = "_z"
) -> DataFrame:
    """Add the N-column Morton key, range-normalizing every column from
    its observed min/max (one tiny aggregate broadcast back).  Bit
    budget splits the 62-bit BIGINT across the columns:
    bits = min(MORTON_BITS, 62 // n) — 16/16/20-bit precision at
    n = 2/3/4... is plenty for a LAYOUT key (finer bits only reorder
    within already-adjacent rows)."""
    n = len(cols)
    if n < 2:
        raise ValueError("with_morton_n needs at least two columns")
    bits = min(MORTON_BITS, 62 // n)
    aggs = []
    for c in cols:
        aggs.append(F.min(c).cast("long").alias(f"_{c}_lo"))
        aggs.append(F.max(c).cast("long").alias(f"_{c}_hi"))
    bounds = df.agg(*aggs)
    widened = df.crossJoin(F.broadcast(bounds))
    top = F.lit((1 << bits) - 1)
    normed = []
    for c in cols:
        lo = F.col(f"_{c}_lo").cast("double")
        hi = F.col(f"_{c}_hi").cast("double")
        span = F.greatest(hi - lo, F.lit(1.0))
        scaled = ((F.col(c).cast("double") - lo) * top.cast("double")) / span
        normed.append(
            F.least(
                F.greatest(F.floor(scaled).cast("long"), F.lit(0)), top
            )
        )
    drop = [f"_{c}_{side}" for c in cols for side in ("lo", "hi")]
    return widened.withColumn(key_col, morton_key_n(normed, bits)).drop(
        *drop
    )


def write_zordered_n(
    df: DataFrame,
    out_dir: str,
    cols: list[str],
    n_files: int = 4,
    writer_options: dict | None = None,
) -> None:
    """Z-ORDER BY (c1, ..., cN) write — the N-column generalization of
    write_zordered: range-partition on the interleaved key (contiguous
    z-range per file), sort within tasks, drop the key."""
    keyed = with_morton_n(df, cols)
    out = (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    writer = out.write.mode("overwrite")
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(out_dir)


def write_zordered(
    df: DataFrame,
    out_dir: str,
    col_x: str,
    col_y: str,
    n_files: int = 4,
    writer_options: dict | None = None,
) -> None:
    """Z-ORDER BY (col_x, col_y) write: RANGE-partition on the Morton
    key (each output file owns a contiguous z-range — a compact
    rectangle of the plane — so FILE-level min/max pruning works, not
    just row-group-level; round-robin would give every file the full
    range), sort within each task, drop the key, write parquet."""
    keyed = with_morton(df, col_x, col_y)
    out = (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    writer = out.write.mode("overwrite")
    for k, v in (writer_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(out_dir)

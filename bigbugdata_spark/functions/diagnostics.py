"""Reusable table-diagnostic primitives — the generic cores behind the
registered profiling queries (prof_key_skew, prof_join_cardinality,
dq_null_profile), exposed as plain DataFrame->DataFrame functions so
any table/key can be profiled, not just the demo bindings the oracle
gate pins.

Each function keeps the registered query's scale contract:
- one map-side-combinable pass over the raw input;
- every subsequent stage runs on a key-/column-cardinality-sized frame;
- BIGINT arithmetic throughout (single IEEE divisions for shares);
- top-K via orderBy+limit (TakeOrderedAndProject), windows only over
  the post-limit frame.

Every card's aggregated frame feeds multiple consumers (totals + top-K;
side totals + overlap join), so each is pinned via the caching
contract (bigbugdata_spark.caching) — one raw scan per input table;
callers release with release_pinned() per that contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigbugdata_spark.caching import pin


def key_skew(df: DataFrame, key: str, top: int = 25) -> DataFrame:
    """Top-`top` heaviest values of `df[key]` with exact share and
    cumulative share, plus key-space totals — the pre-shuffle skew card
    for any prospective join/aggregation key."""
    counts = pin(df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt")))
    tot = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
    )
    head = counts.orderBy(F.desc("cnt"), F.asc(key)).limit(top)
    order = Window.orderBy(F.desc("cnt"), F.asc(key))
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        head.select(
            F.row_number().over(order).cast("long").alias("rnk"),
            key,
            "cnt",
            F.sum("cnt").over(run).alias("cum_cnt"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "rnk",
            key,
            "cnt",
            (F.col("cnt") / F.col("n_rows").cast("double")).alias("share"),
            (F.col("cum_cnt") / F.col("n_rows").cast("double")).alias(
                "cum_share"
            ),
            "n_keys",
            "n_rows",
        )
    )


def join_cardinality(
    left: DataFrame, left_key: str, right: DataFrame, right_key: str
) -> DataFrame:
    """One row predicting the equi-join `left.left_key = right.right_key`
    from per-key counts: side row/key totals, key overlap, exact output
    size, and the worst key's contribution — without running the join."""
    c1 = pin(
        left.groupBy(F.col(left_key).alias("k")).agg(
            F.count(F.lit(1)).alias("n1")
        )
    )
    c2 = pin(
        right.groupBy(F.col(right_key).alias("k")).agg(
            F.count(F.lit(1)).alias("n2")
        )
    )
    j = pin(
        c1.join(c2, "k").select(
            "k", "n1", "n2", (F.col("n1") * F.col("n2")).alias("contrib")
        )
    )
    lt = c1.agg(
        F.sum("n1").cast("long").alias("n_left"),
        F.count(F.lit(1)).alias("n_left_keys"),
    )
    rt = c2.agg(
        F.sum("n2").cast("long").alias("n_right"),
        F.count(F.lit(1)).alias("n_right_keys"),
    )
    jt = j.agg(
        F.count(F.lit(1)).alias("n_common_keys"),
        F.coalesce(F.sum("contrib"), F.lit(0)).cast("long").alias("join_rows"),
    )
    worst = (
        j.orderBy(F.desc("contrib"), F.asc("k"))
        .limit(1)
        .select(
            F.col("k").alias("max_key"),
            F.col("contrib").alias("max_key_rows"),
        )
    )
    # LEFT join (not crossJoin) against the worst-key row: with no
    # common keys `worst` is EMPTY, and a cross join would annihilate
    # the whole card exactly when "this join produces 0 rows" is the
    # answer that matters — the totals row must survive with NULL
    # max_key/max_key_rows.
    return (
        lt.crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(jt))
        .join(F.broadcast(worst), F.lit(True), "left")
        .select(
            "n_left",
            "n_left_keys",
            "n_right",
            "n_right_keys",
            "n_common_keys",
            "join_rows",
            "max_key",
            "max_key_rows",
        )
    )


def encoding_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_values, n_distinct, plain_bytes, dict_bytes,
    encoding) for each STRING column of `df` — the dictionary-vs-plain
    encoding advisor a columnar writer consults: `plain_bytes` is the
    raw payload (Σ byte-length over non-null values), `dict_bytes` the
    dictionary alternative (Σ length over DISTINCT values + one
    minimal-width code per value: 1/2/3/4 bytes for vocabularies up to
    2^8/2^16/2^24/beyond), and `encoding` recommends whichever is
    smaller.  Exact integers throughout.

    One scan: columns unpivot map-side into (col_name, v) pairs; the
    per-value stage shuffles each column's VOCABULARY (not its row
    count), and the final rollup is columns-sized.  Callers pre-project
    columns to deterministic strings (dates formatted, numerics cast)."""
    if not cols:
        raise ValueError("encoding_profile needs at least one column")
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.col_name", "s.v").filter(F.col("v").isNotNull())
    per = pairs.groupBy("col_name", "v").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    agg = per.groupBy("col_name").agg(
        F.sum("cnt").alias("n_values"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.length("v") * F.col("cnt")).alias("plain_bytes"),
        F.sum(F.length("v")).alias("entry_bytes"),
    )
    # all-null columns must still report an all-zeros 'plain' row
    skeleton = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(c) for c in cols])).alias("col_name")
    )
    filled = skeleton.join(F.broadcast(agg), "col_name", "left").select(
        "col_name",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("n_values", "n_distinct", "plain_bytes", "entry_bytes")
        ],
    )
    code_bytes = (
        F.when(F.col("n_distinct") <= (1 << 8), 1)
        .when(F.col("n_distinct") <= (1 << 16), 2)
        .when(F.col("n_distinct") <= (1 << 24), 3)
        .otherwise(4)
    )
    dict_bytes = (
        F.col("entry_bytes") + F.col("n_values") * code_bytes
    ).cast("long")
    return filled.select(
        "col_name",
        "n_values",
        "n_distinct",
        "plain_bytes",
        dict_bytes.alias("dict_bytes"),
        F.when(dict_bytes < F.col("plain_bytes"), F.lit("dict"))
        .otherwise(F.lit("plain"))
        .alias("encoding"),
    )


def null_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_null, n_blank, n_distinct) for each of
    `cols` (default: every column) in ONE scan — columns unpivot
    map-side into (col_name, value-as-string) pairs; the distinct
    aggregate shuffles each column's vocabulary, not its row count."""
    use = list(cols) if cols is not None else list(df.columns)
    if not use:
        raise ValueError("null_profile needs at least one column")
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in use
                ]
            )
        ).alias("s")
    ).select("s.col_name", "s.v")
    blank = (F.col("v").isNotNull() & (F.trim("v") == "")).cast("long")
    grouped = pairs.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("v").isNull().cast("long")).alias("n_null"),
        F.sum(blank).alias("n_blank"),
        F.countDistinct("v").alias("n_distinct"),
    )
    # an EMPTY table must still profile as one all-zeros row per column
    # (matching one aggregate per UNION-ALL oracle branch) — the grouped
    # frame alone would silently vanish
    skeleton = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(c) for c in use])).alias("col_name")
    )
    return skeleton.join(F.broadcast(grouped), "col_name", "left").select(
        "col_name",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("n_rows", "n_null", "n_blank", "n_distinct")
        ],
    )

"""Skew-mitigation utilities: salted joins and two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these are the EXPLICIT tools for the cases AQE can't fix —
a broadcast-ineligible dimension joined on a hot key, or an aggregation
whose single hot group overwhelms one reducer. Both are deterministic
(salt is a hash of row content, never rand()), so salted plans stay
oracle-comparable and replay-stable."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_cols: list[str], n_salts: int) -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of the given
    columns (use high-cardinality payload columns, not the join key)."""
    return df.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in from_cols]), F.lit(n_salts))
    )


def replicate_salts(df: DataFrame, n_salts: int) -> DataFrame:
    """Explode the small side once per salt value so every salted big-side
    partition finds its match. Size cost: |small| x n_salts — choose
    n_salts ~ (hot-key rows / healthy-partition rows)."""
    return df.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int,
    salt_from: list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `key` with the big side's hot keys spread over
    n_salts sub-partitions and the small side replicated to meet them.
    Semantically identical to big.join(small, key, how) — asserted in
    tests — but the shuffle key becomes (key, _salt), so one hot key
    lands on n_salts reducers instead of one.

    Only inner/left are supported: under right/full-outer joins, an
    unmatched small-side row would survive once per salt replica (n_salts
    duplicates) — the replication trick is not outer-join-preserving."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left only, got {how!r}")
    b = with_salt(big, salt_from, n_salts)
    s = replicate_salts(small, n_salts)
    return b.join(s, [key, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    n_salts: int,
    salt_from: list[str],
    *,
    sum_cols: list[str],
) -> DataFrame:
    """Two-phase SUM aggregation: partial on (key, salt), final on key.
    The hot group's rows combine on n_salts reducers before the final
    n_salts-row combine. (Spark's hash agg already does map-side partial
    combine; explicit salting additionally splits the REDUCE side, which
    matters when one group exceeds a single reducer's memory.)"""
    b = with_salt(df, salt_from, n_salts)
    partial = b.groupBy(key, "_salt").agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
    return partial.groupBy(key).agg(*[F.sum(c).alias(c) for c in sum_cols])

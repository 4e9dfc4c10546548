"""Z-order clustering (sources/zorder.py): the Morton key is correct
bit arithmetic, the write never changes content, and — the point —
row-group min/max spans narrow on BOTH dimensions, where a
single-column sort narrows only its own."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigbugdata_spark.sources.zorder import (
    MORTON_BITS,
    morton_key,
    with_morton,
    write_zordered,
)


def test_morton_key_matches_python_interleave(spark):
    """The expression's bit interleave equals a plain-Python witness on
    hand-picked and boundary values."""

    def py_morton(x, y):
        out = 0
        for i in range(MORTON_BITS):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    vals = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 0), (0, 65535),
            (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(vals, "x long, y long")
    rows = df.select(
        "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == py_morton(r["x"], r["y"])


def _rg_spans(root, col):
    import pyarrow.parquet as pq

    spans = []
    for f in sorted(os.listdir(root)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(root, f)).metadata
        idx = md.schema.names.index(col)
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(idx).statistics
            spans.append(st.max - st.min)
    return spans


@pytest.fixture(scope="module")
def grid(spark):
    # a 64x64 integer grid in random-ish (hash) order — the adversarial
    # ingest order where no layout is free
    return (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            ((F.col("id") * 2654435761) % 4096).alias("shuffle_key"),
        )
        .orderBy("shuffle_key")
        .drop("shuffle_key")
    )


def test_zorder_narrows_both_dimensions(tmp_path, spark, grid):
    opts = {"parquet.block.size": 4 * 1024}

    plain = str(tmp_path / "plain")
    grid.repartition(2).write.mode("overwrite").options(**opts).parquet(plain)

    xsort = str(tmp_path / "xsort")
    grid.repartition(2).sortWithinPartitions("x").write.mode(
        "overwrite"
    ).options(**opts).parquet(xsort)

    zord = str(tmp_path / "zord")
    write_zordered(grid, zord, "x", "y", n_files=2, writer_options=opts)

    # enough row groups for span statistics to mean anything
    assert len(_rg_spans(zord, "x")) > 4

    def avg(spans):
        return sum(spans) / len(spans)

    # single-column sort: near-perfect on x, useless on y
    assert avg(_rg_spans(xsort, "x")) < 0.5 * avg(_rg_spans(plain, "x"))
    assert avg(_rg_spans(xsort, "y")) > 0.8 * avg(_rg_spans(plain, "y"))
    # z-order: materially narrower on BOTH (a z-curve row group covers
    # a compact rectangle, not a full-width stripe)
    assert avg(_rg_spans(zord, "x")) < 0.75 * avg(_rg_spans(plain, "x"))
    assert avg(_rg_spans(zord, "y")) < 0.75 * avg(_rg_spans(plain, "y"))
    # and the WORST z-ordered group still beats an unsorted typical one
    assert max(_rg_spans(zord, "x")) <= max(_rg_spans(plain, "x"))


def test_zorder_preserves_content(tmp_path, spark, grid):
    out = str(tmp_path / "z2")
    write_zordered(grid, out, "x", "y", n_files=2)
    back = spark.read.parquet(out)
    assert back.count() == 64 * 64
    a = grid.agg(F.sum(F.col("x") * 4096 + F.col("y"))).first()[0]
    b = back.agg(F.sum(F.col("x") * 4096 + F.col("y"))).first()[0]
    assert a == b
    assert back.select("x", "y").distinct().count() == 64 * 64


def test_with_morton_handles_constant_column(spark):
    """A constant dimension must not divide by zero — span clamps to 1
    and the key degrades to the other column's order."""
    df = spark.createDataFrame([(i, 7) for i in range(16)], "x long, y long")
    rows = with_morton(df, "x", "y").orderBy("x").collect()
    zs = [r["_z"] for r in rows]
    assert zs == sorted(zs)  # monotone in x when y is constant


def test_zorder_n_three_columns_narrow_all_axes(tmp_path, spark):
    """r9 N-column generalization: on an adversarially-shuffled 3-D
    grid, the 3-column Z-order write narrows per-row-group spans on
    ALL THREE axes vs the unsorted baseline, and content survives."""
    from bigbugdata_spark.sources.zorder import write_zordered_n

    n = 16
    rows = [
        (x, y, z)
        for x in range(n)
        for y in range(n)
        for z in range(n)
    ]
    import random

    random.Random(7).shuffle(rows)
    cube = spark.createDataFrame(rows, "x long, y long, z long")
    opts = {"parquet.block.size": 4 * 1024}

    plain = str(tmp_path / "plain3")
    cube.repartition(2).write.mode("overwrite").options(**opts).parquet(plain)
    zord = str(tmp_path / "zord3")
    write_zordered_n(cube, zord, ["x", "y", "z"], n_files=2,
                     writer_options=opts)

    def avg(spans):
        return sum(spans) / len(spans)

    assert len(_rg_spans(zord, "x")) > 4
    for col in ("x", "y", "z"):
        assert avg(_rg_spans(zord, col)) < 0.8 * avg(_rg_spans(plain, col)), col

    back = spark.read.parquet(zord)
    assert back.count() == n ** 3
    a = cube.agg(F.sum(F.col("x") * n * n + F.col("y") * n + F.col("z"))).first()[0]
    b = back.agg(F.sum(F.col("x") * n * n + F.col("y") * n + F.col("z"))).first()[0]
    assert a == b

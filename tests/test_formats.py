"""Format breadth: the engine's tables round-trip through every
built-in columnar/row format (ORC, CSV, JSON) with values preserved,
and the ORC path keeps the same scan-level optimizations the parquet
path is plan-tested for (predicate pushdown + column pruning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.plans import inspect as I


def _sample(spark, sf):
    return (
        table(spark, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .filter(F.col("l_orderkey") < 1000)
    )


def _canon(df):
    return sorted(
        (r.l_orderkey, r.l_linenumber, float(r.l_quantity), r.l_returnflag)
        for r in df.collect()
    )


def test_orc_roundtrip_preserves_values_and_pushes_filters(tmp_path, spark, sf_oracle):
    src = _sample(spark, sf_oracle)
    out = str(tmp_path / "lineitem_orc")
    src.write.mode("overwrite").orc(out)

    back = spark.read.orc(out)
    assert _canon(back) == _canon(src)

    q = back.filter(F.col("l_quantity") < 5.0).select("l_orderkey", "l_quantity")
    scans = I.scan_info(q)
    assert scans and scans[0]["format"] == "orc"
    assert "l_quantity" in scans[0]["pushed_filters"], scans
    assert I.read_columns(q)[0] == {"l_orderkey", "l_quantity"}


def test_csv_roundtrip_preserves_values(tmp_path, spark, sf_oracle):
    src = _sample(spark, sf_oracle)
    out = str(tmp_path / "lineitem_csv")
    src.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(src.schema).option("header", True).csv(out)
    assert _canon(back) == _canon(src)


def test_json_roundtrip_preserves_values(tmp_path, spark, sf_oracle):
    src = _sample(spark, sf_oracle)
    out = str(tmp_path / "lineitem_json")
    src.write.mode("overwrite").json(out)
    # explicit schema, same discipline as sources/jsonl.py (never infer)
    back = spark.read.schema(src.schema).json(out)
    assert _canon(back) == _canon(src)

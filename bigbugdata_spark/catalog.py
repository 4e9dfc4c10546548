"""Table access for the driver-generated star schema (TESTDATA.md).

All queries go through ``table()`` so scans stay declarative: Catalyst gets
the parquet relation directly and can push filters / prune columns into the
scan (verify with plans.inspect.scan_info).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # runtime-settable; required by the TIMESTAMP(NANOS) column even
        # when the caller's session wasn't built by session.get_spark
        # (the round driver passes its own SparkSession)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp->string formatting renders in the session timezone;
        # the oracle's timestamps are naive (effectively UTC), so pin it —
        # a non-UTC caller session would shift every formatted window edge
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read via nanosAsLong (session.py): exact
        # integer div to microseconds — the same truncation DuckDB applies
        # when it reads the nanos column as its native us TIMESTAMP.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ops are also runnable as SQL text."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)

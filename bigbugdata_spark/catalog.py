"""Table access for the driver-generated star schema (TESTDATA.md).

All queries go through ``table()`` so scans stay declarative: Catalyst gets
the parquet relation directly and can push filters / prune columns into the
scan (verify with plans.inspect.scan_info).

SESSION-CONFIG CONTRACT (the one documented side effect): reading the
``events`` table sets ``spark.sql.session.timeZone=UTC`` and
``spark.sql.legacy.parquet.nanosAsLong=true`` on the session, and the
UTC zone must still hold when the returned (lazy) frame executes — the
event queries format timestamps to strings, and a non-UTC zone would
shift every window edge away from the oracle's naive timestamps (and
make the NTZ->TIMESTAMP normalization non-instant-preserving).  A
caller that needs a different session zone for its own plans should run
them on a separate session.  The change is logged (once per distinct
overwrite) instead of silent; it cannot be save/restored around the read
because execution happens later, at the caller's action.

TS-LAYOUT CONTRACT: the events ``ts`` column's physical parquet layout
has varied across test-data generations (TIMESTAMP(NANOS);
``timestamp[us]`` NTZ; ``timestamp[us]`` UTC).  ``normalize_events_ts``
below is the ONLY place those layouts are interpreted — both this batch
path and streaming/core.stream_events route through it, and
tests/test_ts_layouts.py pins identical behavior on all three layouts.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_log = logging.getLogger(__name__)
_warned: set[tuple[str, str]] = set()


def _set_logged(spark: SparkSession, key: str, value: str) -> None:
    """conf.set that announces a real overwrite instead of silently
    changing session-wide behavior (ADVICE r2 #3)."""
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    if old is not None and old != value and (key, old) not in _warned:
        _warned.add((key, old))
        _log.warning(
            "bigbugdata_spark.catalog: overriding session conf %s=%r with %r "
            "for the events table (see catalog module docstring)", key, old, value
        )
    spark.conf.set(key, value)

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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to a plain TIMESTAMP regardless of
    the parquet file's physical layout — THE single normalization point for
    event time (batch ``table()`` and the streaming source both route
    through it; nothing else in the repo may interpret the raw layout).

    Layouts the test-data generator has shipped across rounds:
      * TIMESTAMP(NANOS) read via nanosAsLong=true -> bigint nanoseconds:
        integer div to microseconds, the same truncation DuckDB applies
        when it reads the nanos column as its native us TIMESTAMP;
      * timestamp[us] without UTC adjustment -> TIMESTAMP_NTZ: cast to
        TIMESTAMP — identical instants under the pinned UTC session zone;
      * timestamp[us] UTC-adjusted -> TIMESTAMP: already normalized.
    Pinned across all three by tests/test_ts_layouts.py.
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _events_session_confs(spark: SparkSession) -> None:
    # runtime-settable; required by the TIMESTAMP(NANOS) layout even when
    # the caller's session wasn't built by session.get_spark (the round
    # driver passes its own SparkSession); harmless for other layouts
    _set_logged(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp->string formatting renders in the session timezone; the
    # oracle's timestamps are naive (effectively UTC), so pin it — a
    # non-UTC caller session would shift every formatted window edge, and
    # the NTZ->TIMESTAMP cast above is instant-preserving only under UTC
    _set_logged(spark, "spark.sql.session.timeZone", "UTC")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        _events_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ops are also runnable as SQL text."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)

"""Column-encoding advisor (round 10) — the storage-design card a
columnar writer reads before laying out a 100 TB table: for each
column, the exact byte cost of PLAIN encoding (raw payload) vs
DICTIONARY encoding (vocabulary + minimal-width codes), and which wins.
Low-cardinality columns (returnflag, linestatus, shipmode-alikes)
dictionary-encode at a fraction of plain; key-like columns
(l_orderkey) don't — the card quantifies the cliff instead of assuming
it.  Complements the existing storage family: the partitioned/Z-order
ops decide FILE layout, this decides WITHIN-FILE encoding.

No analog in the reference (SURVEY §2.1); storage extension surface.

Determinism: every column is pre-projected to a deterministic string
(dates via an explicit format, numerics through integral casts — never
a raw double->string cast, whose scientific-notation thresholds differ
across engines); all byte accounting is BIGINT.

Scale posture: one table scan, map-side unpivot (a generate, no
shuffle), one shuffle keyed (col_name, value) — each column's
VOCABULARY, not its row count — then a columns-sized rollup.  Same
plan family as dq_null_profile; the generic core is
functions.diagnostics.encoding_profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigbugdata_spark.catalog import table
from bigbugdata_spark.functions.diagnostics import encoding_profile
from bigbugdata_spark.registry import register

#: (card column, Spark SQL expr, DuckDB expr) — deterministic strings
#: only (expression STRINGS, not Columns: building a Column needs an
#: active SparkContext, and this tuple is evaluated at import time)
_COLS = (
    ("l_returnflag", "l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus", "l_linestatus"),
    (
        "l_linenumber",
        "CAST(l_linenumber AS STRING)",
        "CAST(l_linenumber AS VARCHAR)",
    ),
    (
        "l_quantity",
        "CAST(CAST(l_quantity AS BIGINT) AS STRING)",
        "CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)",
    ),
    (
        "l_orderkey",
        "CAST(l_orderkey AS STRING)",
        "CAST(l_orderkey AS VARCHAR)",
    ),
    (
        "l_shipdate",
        "date_format(l_shipdate, 'yyyy-MM-dd')",
        "strftime(l_shipdate, '%Y-%m-%d')",
    ),
)

_CODE_SQL = """CASE WHEN n_distinct <= 256 THEN 1
                    WHEN n_distinct <= 65536 THEN 2
                    WHEN n_distinct <= 16777216 THEN 3
                    ELSE 4 END"""


def _one_col_sql(name: str, expr: str) -> str:
    return f"""
        SELECT '{name}' AS col_name, n_values, n_distinct, plain_bytes,
               CAST(entry_bytes + n_values * {_CODE_SQL} AS BIGINT)
                   AS dict_bytes,
               CASE WHEN entry_bytes + n_values * {_CODE_SQL} < plain_bytes
                    THEN 'dict' ELSE 'plain' END AS encoding
        FROM (
            SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_values,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(COALESCE(SUM(LENGTH(v) * cnt), 0) AS BIGINT)
                       AS plain_bytes,
                   CAST(COALESCE(SUM(LENGTH(v)), 0) AS BIGINT)
                       AS entry_bytes
            FROM (
                SELECT v, COUNT(*) AS cnt
                FROM (SELECT {expr} AS v FROM lineitem)
                WHERE v IS NOT NULL GROUP BY v
            )
        )"""


_ENCODING_SQL = "\nUNION ALL\n".join(
    _one_col_sql(name, sql) for name, _, sql in _COLS
)


@register(
    "store_encoding_plan",
    oracle=_ENCODING_SQL,
    tags=("storage", "profile"),
    side_effects=True,
)
def store_encoding_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(col_name, n_values, n_distinct, plain_bytes, dict_bytes,
    encoding) for six lineitem columns spanning the cardinality range —
    exact plain-vs-dictionary byte accounting in one scan (the oracle
    spells one UNION ALL branch per column; the Spark plan unpivots
    map-side and profiles all columns in a single pass via
    functions.diagnostics.encoding_profile)."""
    src = table(spark, sf_dir, "lineitem").select(
        *[F.expr(expr).alias(name) for name, expr, _ in _COLS]
    )
    return encoding_profile(src, [name for name, _, _ in _COLS])

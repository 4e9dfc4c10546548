"""Schema-contract conformance gate (round 11) — the declared-schema
check every ingest boundary runs before anything else: each source
table's columns and logical kinds, compared against the pipeline's
DECLARED contract.  A renamed column, a widened int, a float that
became a string — the drift classes that silently poison downstream
casts — each flips a row red here before any query consumes the table.

No analog in the reference (SURVEY §2.1); dq extension surface next to
dq_null_profile (value-level completeness) — this is the METADATA
level of the same gate.

Oracle contract (declared-expectation form, like the dq rule
constants): the DuckDB twin IS the contract — a constant VALUES table
of (table, column, kind) with ok=1 — while the Spark side reports the
ACTUAL kinds of the catalog's read surface (catalog.table, i.e. the
normalized schema the engine's queries really see, events-ts
normalization included) and compares.  Spark drifting from the
contract breaks the hash; both drifting together is a deliberate
contract change, edited here.

Scale posture: pure metadata — one parquet footer read per table,
driver-side; zero data motion at any corpus size (the schema of a
100 TB table is as small as the schema of a 100 MB one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from bigbugdata_spark.catalog import TABLES, table
from bigbugdata_spark.registry import register

#: the declared contract: (table, column, logical kind) — kinds are the
#: engine-neutral vocabulary _kind() maps Spark types onto
CONTRACT: tuple[tuple[str, str, str], ...] = (
    ("region", "r_regionkey", "int32"),
    ("region", "r_name", "string"),
    ("nation", "n_nationkey", "int32"),
    ("nation", "n_name", "string"),
    ("nation", "n_regionkey", "int32"),
    ("customer", "c_custkey", "int64"),
    ("customer", "c_name", "string"),
    ("customer", "c_nationkey", "int32"),
    ("customer", "c_acctbal", "float64"),
    ("customer", "c_mktsegment", "string"),
    ("supplier", "s_suppkey", "int64"),
    ("supplier", "s_name", "string"),
    ("supplier", "s_nationkey", "int32"),
    ("supplier", "s_acctbal", "float64"),
    ("part", "p_partkey", "int64"),
    ("part", "p_name", "string"),
    ("part", "p_brand", "string"),
    ("part", "p_type", "string"),
    ("part", "p_size", "int32"),
    ("part", "p_retailprice", "float64"),
    ("orders", "o_orderkey", "int64"),
    ("orders", "o_custkey", "int64"),
    ("orders", "o_orderstatus", "string"),
    ("orders", "o_totalprice", "float64"),
    ("orders", "o_orderdate", "timestamp"),
    ("orders", "o_orderpriority", "string"),
    ("lineitem", "l_orderkey", "int64"),
    ("lineitem", "l_partkey", "int64"),
    ("lineitem", "l_suppkey", "int64"),
    ("lineitem", "l_linenumber", "int32"),
    ("lineitem", "l_quantity", "float64"),
    ("lineitem", "l_extendedprice", "float64"),
    ("lineitem", "l_discount", "float64"),
    ("lineitem", "l_tax", "float64"),
    ("lineitem", "l_returnflag", "string"),
    ("lineitem", "l_linestatus", "string"),
    ("lineitem", "l_shipdate", "timestamp"),
    ("events", "event_id", "int64"),
    ("events", "ts", "timestamp"),
    ("events", "user_id", "int64"),
    ("events", "event_type", "string"),
    ("events", "value", "float64"),
    ("events", "props", "string"),
    ("documents", "doc_id", "int64"),
    ("documents", "text", "string"),
    ("documents", "lang", "string"),
    ("documents", "source", "string"),
    ("documents", "n_chars", "int64"),
    ("embeddings", "vec_id", "int64"),
    ("embeddings", "embedding", "array<float32>"),
    ("embeddings", "label", "int32"),
)

_CONTRACT_VALUES = ",\n            ".join(
    f"('{t}', '{c}', '{k}')" for t, c, k in CONTRACT
)

_SCHEMA_SQL = f"""
    SELECT table_name, col_name, expected_kind,
           expected_kind AS actual_kind,
           CAST(1 AS INT) AS ok
    FROM (VALUES
            {_CONTRACT_VALUES}
         ) AS contract(table_name, col_name, expected_kind)
"""


def _kind(dt: T.DataType) -> str:
    """Engine-neutral logical kind of a Spark type (nested arrays one
    level deep — the contract's vocabulary)."""
    mapping = {
        T.LongType: "int64",
        T.IntegerType: "int32",
        T.ShortType: "int16",
        T.ByteType: "int8",
        T.DoubleType: "float64",
        T.FloatType: "float32",
        T.StringType: "string",
        T.BooleanType: "bool",
        T.DateType: "date",
        T.TimestampType: "timestamp",
        T.TimestampNTZType: "timestamp",
        T.BinaryType: "binary",
    }
    if isinstance(dt, T.ArrayType):
        return f"array<{_kind(dt.elementType)}>"
    for cls, name in mapping.items():
        if isinstance(dt, cls):
            return name
    return dt.simpleString()


@register(
    "dq_schema_contract",
    oracle=_SCHEMA_SQL,
    tags=("dq", "storage"),
    side_effects=True,
)
def dq_schema_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_name, col_name, expected_kind, actual_kind, ok) for every
    contract column plus any UNDECLARED column found (expected_kind
    'missing', ok=0): the actual kinds come from the catalog's
    normalized read surface — the schema the engine's queries really
    consume."""
    expected = {(t, c): k for t, c, k in CONTRACT}
    rows = []
    for t in TABLES:
        actual = {f.name: _kind(f.dataType) for f in table(spark, sf_dir, t).schema.fields}
        for (ct, cc), k in expected.items():
            if ct != t:
                continue
            act = actual.pop(cc, "missing")
            rows.append((t, cc, k, act, int(act == k)))
        for cc, act in actual.items():  # undeclared leftovers
            rows.append((t, cc, "missing", act, 0))
    return spark.createDataFrame(
        rows,
        "table_name string, col_name string, expected_kind string, "
        "actual_kind string, ok int",
    )

"""The SQL surface (SURVEY §2.1: every relational op is also runnable as
SQL text over registered temp views — Spark's parser comes for free).

Strongest form: the DuckDB oracle strings are ANSI enough that Spark
itself executes them — same text, two engines, same rows as the
DataFrame plans. Ops whose oracle uses DuckDB-only spellings
(regexp_matches, bare VARCHAR casts) are skipped explicitly; the
DataFrame API remains their canonical form."""

from __future__ import annotations

import pytest

from bigbugdata_spark.catalog import register_views
from bigbugdata_spark.registry import load_all
from tests.parity import canon_rows

SPECS = load_all()

# DuckDB-only spellings in the oracle text (documented, not silent)
SKIP = {
    "op09_numeric_aware_sort",  # CAST(.. AS VARCHAR) needs a length in Spark
    "op12_regex_control_groups",  # regexp_matches is DuckDB-only
}

RELATIONAL = sorted(
    n for n, s in SPECS.items() if n.startswith("op") and s.oracle and n not in SKIP
)


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_oracle):
    register_views(spark, sf_oracle)


@pytest.mark.parametrize("name", RELATIONAL)
def test_oracle_sql_runs_on_spark(spark, sf_oracle, name):
    spec = SPECS[name]
    via_sql = spark.sql(spec.oracle)
    via_df = spec.fn(spark, sf_oracle)
    sql_rows = canon_rows([tuple(r) for r in via_sql.collect()], via_sql.columns)
    df_rows = canon_rows([tuple(r) for r in via_df.collect()], via_df.columns)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    assert sql_rows == df_rows


# TPC-H oracles ANSI enough that Spark parses them verbatim — the same
# text DuckDB hash-verifies also executes on Spark's parser, covering
# EXISTS / NOT EXISTS / scalar subqueries / HAVING as SQL-surface shapes.
TPCH_SQL = sorted(
    n
    for n, s in SPECS.items()
    if n.startswith("tpch") and s.oracle and "strftime" not in s.oracle
)


@pytest.mark.parametrize("name", TPCH_SQL)
def test_tpch_oracle_sql_runs_on_spark(spark, sf_oracle, name):
    spec = SPECS[name]
    via_sql = spark.sql(spec.oracle)
    via_df = spec.fn(spark, sf_oracle)
    sql_rows = canon_rows([tuple(r) for r in via_sql.collect()], via_sql.columns)
    df_rows = canon_rows([tuple(r) for r in via_df.collect()], via_df.columns)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    assert sql_rows == df_rows

"""The local correctness gate: every registered query with an oracle must
match DuckDB exactly at sf0.01 — the same comparison the driver runs."""

from __future__ import annotations

import pytest

from bigbugdata_spark.registry import load_all
from tests.parity import compare, duckdb_connect

SPECS = load_all()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.fixture(scope="module")
def con(sf_oracle):
    con = duckdb_connect(sf_oracle)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_oracle, con, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_oracle)
    ok, msg = compare(df, con, spec.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only(spark, sf_oracle, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_oracle)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

"""Mini driver gate: every queries() entry with an oracle must match
DuckDB on sf0.001 (the driver runs the same at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_compare import compare, duckdb_conn

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    df = q(spark, sf_dir)
    if name not in oracles:
        assert df.count() >= 0, f"{name}: rows-only check failed"
        return
    errors = compare(df, con, oracles[name])
    assert not errors, f"{name}: " + "; ".join(errors[:6])

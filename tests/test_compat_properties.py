"""Property-based hardening of the cross-engine exactness layer
(functions/compat.py) — the infrastructure every oracle hash depends
on. Round-1 showed that a single sum-order float boundary flips a
bit-exact gate; these tests pin the contracts broadly instead of at
the handful of values the gate data happens to contain.

Strategy split: hypothesis drives Python-vs-DuckDB equivalence (cheap
per example — one vectorized DuckDB call per case); Spark equivalence
runs once over a large seeded batch (a Spark job per hypothesis
example would be minutes, and Spark evaluates the same IEEE ops
whole-stage-codegen'd, so one wide batch covers it).
"""

from __future__ import annotations

import math
import struct

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.functions.compat import hround, units


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


@st.composite
def _cents_lists(draw):
    return draw(
        st.lists(
            st.integers(min_value=-(10**14), max_value=10**14),
            min_size=1,
            max_size=100,
        )
    )


@settings(max_examples=200, deadline=None)
@given(_cents_lists())
def test_units_recovers_exact_cents_py_vs_duckdb(cents):
    """units contract: for any integer-cent value stored as a double
    (c/100.0), floor(x*100+0.5) recovers c exactly — in Python IEEE
    and in DuckDB, including negatives (c_acctbal)."""
    xs = [c / 100.0 for c in cents]
    py = [math.floor(x * 100.0 + 0.5) for x in xs]
    assert py == cents
    con = duckdb.connect()
    got = con.execute(
        "SELECT list_transform(?::DOUBLE[],"
        " x -> CAST(floor(x * 100.0 + 0.5) AS BIGINT))",
        [xs],
    ).fetchone()[0]
    assert got == cents


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e12,
            max_value=1e12,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=100,
    )
)
def test_hround_bitwise_py_vs_duckdb(xs):
    """hround contract: floor(x*100+0.5)/100 is bit-identical between
    Python IEEE and DuckDB for ARBITRARY doubles — every step is an
    exactly-specified IEEE-754 op (where round() would diverge)."""
    py = [math.floor(x * 100.0 + 0.5) / 100.0 for x in xs]
    con = duckdb.connect()
    got = con.execute(
        "SELECT list_transform(?::DOUBLE[], x -> floor(x * 100.0 + 0.5) / 100.0)",
        [xs],
    ).fetchone()[0]
    assert [_bits(a) for a in py] == [_bits(b) for b in got]


@settings(max_examples=100, deadline=None)
@given(_cents_lists())
def test_xsum_integer_accumulation_py_vs_duckdb(cents):
    """xsum contract: the integer-unit sum is order-independent and
    identical after DuckDB's HUGEINT sum collapses to BIGINT."""
    xs = [c / 100.0 for c in cents]
    py_total = sum(math.floor(x * 100.0 + 0.5) for x in xs)
    con = duckdb.connect()
    got = con.execute(
        "SELECT CAST(sum(CAST(floor(x * 100.0 + 0.5) AS BIGINT)) AS BIGINT)"
        " FROM (SELECT unnest(?::DOUBLE[]) AS x)",
        [xs],
    ).fetchone()[0]
    assert got == py_total
    assert py_total / 100.0 == got / 100.0


def test_units_hround_spark_matches_python(spark):
    """One wide seeded batch through Spark's codegen'd expressions:
    units and hround collect bit-identically to the Python reference
    (which the hypothesis tests above tie to DuckDB)."""
    rng = np.random.default_rng(42)
    cents = rng.integers(-(10**14), 10**14, size=4000)
    arb = rng.uniform(-1e12, 1e12, size=1000)
    xs = np.concatenate([cents / 100.0, arb])
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    rows = (
        df.select(units(F.col("x"), 2).alias("u"), hround(F.col("x"), 2).alias("h"))
        .collect()
    )
    for x, r in zip(xs, rows):
        assert r["u"] == math.floor(x * 100.0 + 0.5)
        assert _bits(r["h"]) == _bits(math.floor(x * 100.0 + 0.5) / 100.0)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])

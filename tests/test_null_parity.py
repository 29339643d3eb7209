"""Adversarial null-fixture oracle parity: the driver testdata has
ZERO nulls anywhere, so the standard gate never exercises null
semantics. This sweep re-runs a cross-family query subset against a
~6% null-injected twin of sf0.001 (tests/null_fixture.py) and
compares Spark vs DuckDB on it — the class of latent divergence the
round-2 advice flagged on distribution_drift_l1 (and which this sweep
actually caught three more of: Spark size(NULL) = -1 vs DuckDB
len(NULL) = NULL in the BPE/marker counters, and concat_ws silently
skipping a null hash component in dp_noise_histogram)."""

from __future__ import annotations

import pytest

# FULL registry (every oracle-paired batch query): the sweep found 18
# real divergences on its first full run — value-null window
# reordering, size(NULL)=-1 vs len(NULL)=NULL, concat_ws null-skip,
# pandas dropna/count semantics, value-null-as-join-miss
# classification, binaryFile's silent zero-byte skip — so the whole
# surface stays gated, not a sample. Streaming queries are excluded:
# their file-stream sources declare explicit schemas over dedicated
# fixture layouts (a separate harness, tests/test_streaming*.py).
def _sweep_names() -> list[str]:
    import __spark_entry__ as entry

    return sorted(
        n for n in entry.oracle_sql() if not n.startswith("streaming_")
    )


SWEEP = _sweep_names()


@pytest.fixture(scope="session")
def null_sf_dir(tmp_path_factory):
    from tests.null_fixture import build

    dst = tmp_path_factory.mktemp("nullfx")
    return build("/root/testdata/sf0.001", str(dst))


@pytest.fixture(scope="session")
def null_oracle_con(null_sf_dir):
    from tests.oracle_compare import duckdb_conn

    con = duckdb_conn(null_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", SWEEP)
def test_null_fixture_parity(spark, null_sf_dir, null_oracle_con, name):
    from tests.oracle_compare import compare

    import __spark_entry__ as entry

    df = entry.queries()[name](spark, null_sf_dir)
    errs = compare(df, null_oracle_con, entry.oracle_sql()[name])
    assert not errs, errs[:5]


def test_null_fixture_actually_has_nulls(spark, null_sf_dir):
    """Guard the guard: the fixture must inject nulls into every
    declared column, or the sweep silently degrades to the standard
    gate."""
    from pyspark.sql import functions as F

    from tests.null_fixture import NULLED
    from youtube_etl_automated_pipeline_spark.sources import load_table

    for t, cols in NULLED.items():
        df = load_table(spark, null_sf_dir, t)
        for c in cols:
            n = df.filter(F.col(c).isNull()).count()
            assert n > 0, f"{t}.{c} has no injected nulls"

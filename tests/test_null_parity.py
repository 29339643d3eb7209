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

# cross-family subset: every table with injected nulls is covered by
# several consumers (joins, aggs, windows, text kernels, hashing)
SWEEP = [
    "q1_pricing_summary",
    "flagship_enrich_dedup_agg",
    "rollup_region_nation",
    "nation_revenue_share",
    "two_key_rollup",
    "keep_last_dedup",
    "distinct_count_audit",
    "distribution_drift_l1",
    "psi_revenue_drift",
    "k_anonymity_census",
    "ab_test_ztest",
    "event_transition_matrix",
    "attribution_last_touch",
    "attribution_linear",
    "text_token_stats",
    "text_lang_id",
    "text_quality_score",
    "dedup_exact",
    "doc_fingerprint",
    "bm25_search_docs",
    "lm_perplexity_buckets",
    "auc_mann_whitney",
    "vocab_coverage_curve",
    "cohens_kappa_langid",
    "rrf_fused_search",
    "retrieval_rank_eval",
    "corpus_mix_contingency",
    "corpus_budget_apportion",
    "dp_noise_histogram",
    "bootstrap_ci_nation_revenue",
    "ols_price_model",
    "statistical_aggregates",
    "hard_negative_mining",
    "equi_depth_histogram",
    "user_activity_streaks",
    "survival_kaplan_meier",
    "segment_priority_dependence",
]


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

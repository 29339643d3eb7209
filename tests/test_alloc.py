"""Conservation tests for the exact-allocation operators
(plans/queries_alloc.py): the properties float arithmetic cannot
give — credit sums to attributed value to the cent, quotas sum to
the budget exactly."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_linear_attribution_conserves_cents(spark):
    from youtube_etl_automated_pipeline_spark.plans.queries_alloc import (
        ATTR_WINDOW_DAYS,
        attribution_linear,
    )
    from youtube_etl_automated_pipeline_spark.sources import load_table

    got = attribution_linear(spark, SF).collect()
    total_credit = sum(r.credit_cents for r in got)

    # python ground truth: sum of cents over purchases having >= 1
    # in-window click (conservation: every such purchase's value is
    # fully distributed, nothing else is credited)
    ev = (
        load_table(spark, SF, "events")
        .select(
            "user_id",
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
            F.expr("CAST(floor(value * 1e2 + 5e-1) AS BIGINT)").alias(
                "cents"
            ),
        )
        .collect()
    )
    clicks_by_user: dict[int, list] = {}
    for r in ev:
        if r.event_type == "click":
            clicks_by_user.setdefault(r.user_id, []).append(r.ts)
    expect = 0
    n_pairs = 0
    for r in ev:
        if r.event_type != "purchase":
            continue
        lo = r.ts - dt.timedelta(days=ATTR_WINDOW_DAYS)
        k = sum(
            1
            for c in clicks_by_user.get(r.user_id, [])
            if lo <= c < r.ts
        )
        if k:
            expect += r.cents
            n_pairs += k
    assert total_credit == expect
    assert sum(r.n_credited_clicks for r in got) == n_pairs


def test_apportionment_sums_to_budget_and_is_proportional(spark):
    from youtube_etl_automated_pipeline_spark.plans.queries_alloc import (
        CORPUS_BUDGET,
        corpus_budget_apportion,
    )

    rows = corpus_budget_apportion(spark, SF).collect()
    assert sum(r.quota_docs for r in rows) == CORPUS_BUDGET
    total_mass = sum(r.mass for r in rows)
    for r in rows:
        ideal = CORPUS_BUDGET * r.mass / total_mass
        # Hamilton quotas never deviate more than 1 seat from the
        # real-valued ideal share
        assert abs(r.quota_docs - ideal) < 1.0

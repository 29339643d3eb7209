"""Bilateral join-IVM invariants: after ANY interleaving of side
deltas the log-structured view equals the one-shot join, and a
retried apply is a no-op (idempotent delta directories)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from youtube_etl_automated_pipeline_spark.sources import load_table
from youtube_etl_automated_pipeline_spark.streaming.ivm import JoinView


def _fingerprint(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("o_orderkey", "c_custkey")).alias("h"),
    ).first()


def _mk(tmp_path):
    return JoinView(
        a_dir=str(tmp_path / "a"),
        b_dir=str(tmp_path / "b"),
        j_dir=str(tmp_path / "j"),
        a_key="o_custkey",
        b_key="c_custkey",
    )


def test_view_equals_oneshot_join_after_every_apply(spark, tmp_path):
    view = _mk(tmp_path)
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_nationkey")

    a0 = orders.filter(F.col("o_orderkey") % 2 == 0)
    a1 = orders.filter(F.col("o_orderkey") % 2 == 1)
    b0 = cust.filter(F.col("c_custkey") % 2 == 0)
    b1 = cust.filter(F.col("c_custkey") % 2 == 1)

    # A-before-B arrival: a0 joins nothing yet, pairs appear at b0
    view.apply_delta_a(a0, "a0")
    view.apply_delta_b(b0, "b0")
    expect = a0.join(b0, a0.o_custkey == cust.c_custkey)
    assert _fingerprint(view.view(spark)) == _fingerprint(expect)

    view.apply_delta_a(a1, "a1")
    view.apply_delta_b(b1, "b1")
    full = orders.join(cust, orders.o_custkey == cust.c_custkey)
    assert _fingerprint(view.view(spark)) == _fingerprint(full)


def test_retried_apply_is_noop(spark, tmp_path):
    view = _mk(tmp_path)
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_nationkey")

    view.apply_delta_b(cust, "b0")
    view.apply_delta_a(orders, "a0")
    before = _fingerprint(view.view(spark))
    # a crashed-and-retried apply rewrites the same delta directory
    view.apply_delta_a(orders, "a0")
    assert _fingerprint(view.view(spark)) == before

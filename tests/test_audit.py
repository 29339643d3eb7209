"""Inline observe-based audits: metrics arrive as a side effect of
the job action — no second scan — and match independently computed
ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from youtube_etl_automated_pipeline_spark.operators.audit import audited
from youtube_etl_automated_pipeline_spark.sources import load_table


def test_audit_counts_and_null_keys(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    df, obs = audited(li, "scan_audit", key="l_orderkey")
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    truth = li.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.xxhash64(F.col("l_orderkey"))).alias("cks"),
    ).collect()[0]
    assert got["rows"] == truth["rows"]
    assert got["null_keys"] == 0
    assert got["key_checksum"] == truth["cks"]


def test_audit_across_stage_boundaries(spark):
    """Two observation points on one plan: input vs post-filter —
    the retention ratio a pipeline would alert on, from one pass."""
    orders = load_table(spark, SF_SMOKE, "orders")
    src, obs_in = audited(orders, "in")
    filtered, obs_out = audited(
        src.filter(F.col("o_orderpriority") == "1-URGENT"), "out"
    )
    filtered.write.format("noop").mode("overwrite").save()
    n_in, n_out = obs_in.get["rows"], obs_out.get["rows"]
    assert n_in == orders.count()
    assert 0 < n_out < n_in


def test_audit_custom_metric(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    df, obs = audited(
        ev, "ev_audit", F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts")
    )
    df.write.format("noop").mode("overwrite").save()
    assert obs.get["min_ts"] <= obs.get["max_ts"]

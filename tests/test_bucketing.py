"""Co-located joins via bucketing and salted skew-safe aggregation:
the two write/plan-level scale strategies, verified on real plans."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from youtube_etl_automated_pipeline_spark.operators.skew import salted_count_sum
from youtube_etl_automated_pipeline_spark.sinks import write_bucketed
from youtube_etl_automated_pipeline_spark.sources import load_table


def test_bucketed_join_has_no_join_shuffle(spark):
    write_bucketed(
        load_table(spark, SF_SMOKE, "orders"), "b_orders", "o_orderkey"
    )
    write_bucketed(
        load_table(spark, SF_SMOKE, "lineitem"), "b_lineitem", "l_orderkey"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
        # the ONLY shuffle is the downstream groupBy key — the join
        # itself reads co-located buckets with no Exchange on either side
        assert all("o_orderstatus" in e for e in exchanges), exchanges
        assert "SortMergeJoin" in plan
        # sanity: same result as the unbucketed join
        n = joined.agg(F.sum("n")).first()[0]
        assert n == load_table(spark, SF_SMOKE, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_agg_matches_direct(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    salted = {
        r["event_type"]: r
        for r in salted_count_sum(
            ev, ["event_type"], "value", F.col("event_id")
        ).collect()
    }
    direct = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("value").alias("sum_value"))
        .collect()
    }
    assert set(salted) == set(direct)
    for k in direct:
        assert salted[k]["n_rows"] == direct[k]["n_rows"]
        assert abs(salted[k]["sum_value"] - direct[k]["sum_value"]) < 1e-6


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling: a 90%-one-key join gets its skewed
    reducer partition split across mapper ranges (SortMergeJoin
    skew=true) instead of serializing on one task. Thresholds are
    lowered to make the tiny local data 'skewed'; splitting needs
    multiple mappers (widen_scan) — at real scale both are automatic.
    """
    from youtube_etl_automated_pipeline_spark.sources import widen_scan

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = widen_scan(load_table(spark, SF_SMOKE, "lineitem")).select(
            F.when(F.col("l_orderkey") % 10 != 0, F.lit(1))
            .otherwise(F.col("l_orderkey"))
            .alias("k"),
            F.md5(F.concat_ws("-", "l_orderkey", "l_partkey", "l_linenumber")).alias(
                "pay"
            ),
        )
        right = widen_scan(load_table(spark, SF_SMOKE, "orders")).select(
            F.col("o_orderkey").alias("k"), "o_totalprice"
        )
        j = li.join(right, "k")
        n = len(j.collect())
        assert n == load_table(spark, SF_SMOKE, "lineitem").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

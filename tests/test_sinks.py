"""E3 flush lifecycle: append -> dedup+swap -> truncate staging."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from youtube_etl_automated_pipeline_spark import sinks
from youtube_etl_automated_pipeline_spark.sources import load_table


def test_flush_lifecycle(spark, tmp_path):
    staging = str(tmp_path / "staging")
    table = str(tmp_path / "table")

    cust = load_table(spark, SF_SMOKE, "customer").limit(100)
    batch1 = cust.withColumn("_seq", F.lit(1))
    batch1.write.parquet(staging)

    sinks.flush(spark, staging, table, key="c_custkey", order_col="_seq")
    assert spark.read.parquet(table).count() == 100
    # staging truncated, schema preserved
    st = spark.read.parquet(staging)
    assert st.count() == 0
    assert set(st.columns) == set(batch1.columns)

    # second flush with overlapping keys: keep-last wins
    batch2 = cust.limit(40).withColumn("_seq", F.lit(2)).withColumn(
        "c_name", F.lit("UPDATED")
    )
    sinks.overwrite_table(batch2, staging)
    sinks.flush(spark, staging, table, key="c_custkey", order_col="_seq")

    out = spark.read.parquet(table)
    assert out.count() == 100
    assert out.select("c_custkey").distinct().count() == 100
    assert out.filter(F.col("c_name") == "UPDATED").count() == 40

    # empty staging short-circuits (P9): table untouched
    sinks.flush(spark, staging, table, key="c_custkey", order_col="_seq")
    assert spark.read.parquet(table).count() == 100


def test_approx_distinct_error_envelope(spark):
    from youtube_etl_automated_pipeline_spark.plans.queries_sql import (
        approx_distinct_customers,
    )

    for r in approx_distinct_customers(spark, SF_SMOKE).collect():
        assert abs(r["approx_custs"] - r["exact_custs"]) <= max(
            0.05 * r["exact_custs"], 2
        )


def test_full_dag_pipeline_to_warehouse(spark, tmp_path):
    """The reference's complete DAG including task 7: wide-fact chain
    (E1) -> all-string sanitized sink projection (F8/F9) -> staging ->
    warehouse flush with window dedup (E3). One row per video_id
    survives; re-flushing restated data overwrites keep-last."""
    from youtube_etl_automated_pipeline_spark.pipeline import to_sink_projection
    from youtube_etl_automated_pipeline_spark.plans.queries_pipeline import (
        pipeline_e2e,
    )

    staging = str(tmp_path / "staging")
    warehouse = str(tmp_path / "warehouse")

    wide = pipeline_e2e(spark, SF_SMOKE)
    sinkable = to_sink_projection(wide).withColumn("_seq", F.lit(1))
    # every column stringly-typed with warehouse-safe names (F8/F9)
    for f in sinkable.schema.fields:
        if f.name != "_seq":
            assert f.dataType.simpleString() == "string"
            assert all(c.isalnum() or c == "_" for c in f.name), f.name

    sinkable.write.parquet(staging)
    sinks.flush(spark, staging, warehouse, key="video_id", order_col="_seq")

    wh = spark.read.parquet(warehouse)
    n = wide.count()
    assert wh.count() == n
    assert wh.select("video_id").distinct().count() == n

    # restated re-flush: 10 videos restated -> keep-last wins, count stable
    restated = (
        spark.read.parquet(warehouse)
        .limit(10)
        .withColumn("title", F.lit("RESTATED"))
        .withColumn("_seq", F.lit(2))
    )
    sinks.overwrite_table(restated, staging)
    sinks.flush(spark, staging, warehouse, key="video_id", order_col="_seq")
    wh2 = spark.read.parquet(warehouse)
    assert wh2.count() == n
    assert wh2.filter(F.col("title") == "RESTATED").count() == 10

"""Partitioned-table writes + partition pruning, and CSV source
round-trip (S2's header-schema scan for non-parquet edges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from youtube_etl_automated_pipeline_spark.sources import load_table


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitionBy on the date column: a date-filtered scan
    must read only the matching partition directories (the 100 TB
    time-series layout — pruning happens at planning, not runtime)."""
    path = str(tmp_path / "events_by_day")
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.partitionBy("event_date").parquet(path)

    n_days = ev.select("event_date").distinct().count()
    assert n_days > 1

    one_day = ev.select(F.min("event_date")).first()[0]
    scan = spark.read.parquet(path).filter(F.col("event_date") == F.lit(one_day))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # the equality predicate lands in PartitionFilters (planning-time
    # directory pruning), NOT in PushedFilters/post-scan Filter
    assert "PartitionFilters: [isnotnull(event_date" in plan
    assert f"(event_date#" in plan and str(one_day) in plan
    expected = ev.filter(F.col("event_date") == F.lit(one_day)).count()
    assert scan.count() == expected


def test_csv_source_roundtrip(spark, tmp_path):
    """S2: header'd CSV scan with explicit schema matches the parquet
    source row-for-row."""
    path = str(tmp_path / "nation_csv")
    nat = load_table(spark, SF_SMOKE, "nation")
    nat.write.option("header", True).csv(path)
    back = spark.read.option("header", True).schema(nat.schema).csv(path)
    assert back.schema == nat.schema
    a = sorted(map(tuple, nat.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_ingest_window_predicate_pushes_down(spark):
    """F12/P3: the as_of-parameterized late-data window is a pushable
    parquet predicate (the reference's publishedAfter/Before range)."""
    from youtube_etl_automated_pipeline_spark.functions.dates import (
        in_ingest_window,
        ingest_window,
    )

    assert ingest_window("2024-01-10") == (
        "2024-01-06 00:00:00",
        "2024-01-07 23:59:59",
    )
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_ts", F.col("o_orderdate").cast("timestamp")
    )
    windowed = orders.filter(in_ingest_window(F.col("o_ts"), "2024-03-01"))
    n = windowed.count()
    # matches a hand-computed range filter
    manual = orders.filter(
        (F.col("o_orderdate") >= "2024-02-26") & (F.col("o_orderdate") <= "2024-02-27")
    ).count()
    assert n == manual


def test_metadata_hidden_columns_expose_file_lineage(spark, tmp_path):
    """The _metadata hidden struct (file_name/file_size/row_index)
    surfaces per-row file lineage without any side channel — the
    audit surface for 'which input file produced this bad row' at
    100 TB. Row counts per file must match the on-disk layout."""
    import os

    from pyspark.sql import functions as F

    from youtube_etl_automated_pipeline_spark.sources import load_table

    out = str(tmp_path / "lineage")
    load_table(spark, SF_SMOKE, "orders").repartition(4).write.parquet(out)

    per_file = (
        spark.read.parquet(out)
        .select(F.col("_metadata.file_name").alias("f"))
        .groupBy("f")
        .count()
        .collect()
    )
    disk_files = {
        e for e in os.listdir(out) if e.endswith(".parquet")
    }
    assert {r["f"] for r in per_file} == disk_files
    assert sum(r["count"] for r in per_file) == load_table(
        spark, SF_SMOKE, "orders"
    ).count()


def test_max_partition_bytes_controls_scan_parallelism(spark):
    """spark.sql.files.maxPartitionBytes is the spill-safety knob the
    brief calls out: shrinking it must split the same parquet into
    more scan partitions (each task reads a bounded byte range)."""
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    prev_cost = spark.conf.get("spark.sql.files.openCostInBytes")
    li_path = f"{SF_SMOKE}/lineitem.parquet"
    try:
        # maxSplitBytes = min(maxPartitionBytes, max(openCost,
        # totalBytes/defaultParallelism)); pin openCost ABOVE the file
        # size so the smoke file's tiny bytes-per-core term doesn't
        # decide the split, leaving maxPartitionBytes in control —
        # exactly its role once files dwarf core count at real scale
        spark.conf.set("spark.sql.files.openCostInBytes", "4MB")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128MB")
        wide = spark.read.parquet(li_path).rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16KB")
        narrow = spark.read.parquet(li_path).rdd.getNumPartitions()
        assert narrow > wide, (narrow, wide)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        spark.conf.set("spark.sql.files.openCostInBytes", prev_cost)

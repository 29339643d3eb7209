"""Python Data Source WRITE path (api_batch_sink): two-phase commit
semantics — staged-then-published files, manifest accounting,
overwrite replacement, abort leaves prior data untouched."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from youtube_etl_automated_pipeline_spark.sources import load_table
from youtube_etl_automated_pipeline_spark.sources.api_sink import register


def _manifest(target: str) -> dict:
    with open(os.path.join(target, "_MANIFEST.json")) as f:
        return json.load(f)


def test_api_sink_roundtrip_and_manifest(spark, tmp_path):
    register(spark)
    target = str(tmp_path / "sink")
    os.makedirs(target)
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    n = ev.count()
    ev.repartition(4).write.format("api_batch_sink").option(
        "batch_size", 100
    ).mode("append").save(target)

    m = _manifest(target)
    assert m["total_rows"] == n
    assert len(m["files"]) == 4
    # request accounting: each partition ceil(rows/100) calls
    assert m["total_requests"] >= n // 100
    assert not os.path.exists(os.path.join(target, "_staging"))

    back = spark.read.schema(
        "event_id bigint, user_id bigint, event_type string, value double"
    ).json(os.path.join(target, "*.jsonl"))
    assert back.count() == n
    assert (
        back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0
    )


def test_api_sink_overwrite_replaces_published_files(spark, tmp_path):
    register(spark)
    target = str(tmp_path / "sink")
    os.makedirs(target)
    df1 = spark.range(100).select(F.col("id").alias("k"))
    df1.coalesce(2).write.format("api_batch_sink").mode("append").save(target)
    assert _manifest(target)["total_rows"] == 100

    df2 = spark.range(7).select(F.col("id").alias("k"))
    df2.coalesce(1).write.format("api_batch_sink").mode("overwrite").save(target)
    m = _manifest(target)
    assert m["total_rows"] == 7 and len(m["files"]) == 1
    back = spark.read.schema("k bigint").json(os.path.join(target, "*.jsonl"))
    assert back.count() == 7


def test_api_sink_abort_keeps_prior_data(spark, tmp_path):
    register(spark)
    target = str(tmp_path / "sink")
    os.makedirs(target)
    spark.range(50).select(F.col("id").alias("k")).coalesce(1).write.format(
        "api_batch_sink"
    ).mode("append").save(target)
    before = _manifest(target)

    # a task-side failure mid-job: the commit never runs, staging is
    # aborted, previously published data + manifest stay intact
    failing = spark.range(10).select(
        F.expr("assert_true(id < 5, 'poison row')").alias("chk"),
        F.col("id").alias("k"),
    )
    with pytest.raises(Exception):
        failing.coalesce(1).write.format("api_batch_sink").mode(
            "overwrite"
        ).save(target)

    after = _manifest(target)
    assert after == before
    assert not os.path.exists(os.path.join(target, "_staging"))
    back = spark.read.schema("k bigint").json(os.path.join(target, "*.jsonl"))
    assert back.count() == 50


def test_api_stream_sink_publishes_per_batch_manifests(spark, tmp_path):
    """Streaming write path (DataSourceStreamArrowWriter): each
    micro-batch publishes under batch=<id>/ with its own manifest;
    totals across batches equal the source row count."""
    register(spark)
    src, ckpt, target = (
        str(tmp_path / "src"),
        str(tmp_path / "ckpt"),
        str(tmp_path / "sink"),
    )
    os.makedirs(target)
    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "value")
    n = ev.count()
    # 3 files -> maxFilesPerTrigger=1 gives 3 real micro-batches
    ev.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema("event_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.format("api_batch_sink")
        .option("path", target)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch_dirs = sorted(d for d in os.listdir(target) if d.startswith("batch="))
    assert len(batch_dirs) == 3, batch_dirs
    total = 0
    for d in batch_dirs:
        with open(os.path.join(target, d, "_MANIFEST.json")) as f:
            m = json.load(f)
        assert m["files"], m
        total += m["total_rows"]
    assert total == n
    back = spark.read.schema("event_id bigint, value double").json(
        os.path.join(target, "batch=*", "*.jsonl")
    )
    assert back.count() == n


def test_api_sink_late_write_after_abort_leaves_no_zombie(tmp_path):
    """Round-8 regression for the abort race: a task still DRAINING
    when the driver aborts must not leave a zombie staged file (or a
    recreated empty ``_staging`` dir) behind. The driver-side
    ``abort()`` touches a job-scoped marker BEFORE sweeping staging;
    ``write()`` re-checks the marker after staging, so a write that
    lands after the rmtree self-cleans and fails the task.

    Driven directly against the writer object (no Spark job) so the
    interleaving is deterministic: abort first, then the late write."""
    import pyarrow as pa

    from youtube_etl_automated_pipeline_spark.sources.api_sink import (
        BatchedApiWriter,
        _staging_dir,
    )

    target = str(tmp_path / "sink")
    os.makedirs(target)
    writer = BatchedApiWriter({"path": target, "batch_size": 10}, False)

    # Driver aborts while (conceptually) a task is mid-drain.
    writer.abort([])
    assert not os.path.exists(_staging_dir(target))

    # The straggler task's write() now lands: pre-check refuses.
    batch = pa.record_batch({"k": pa.array([1, 2, 3])})
    with pytest.raises(RuntimeError, match="aborted"):
        writer.write(iter([batch]))
    assert not os.path.exists(_staging_dir(target))

    # Worst-case interleaving: the task passes the pre-check, stages
    # its file, and only THEN does the driver abort (marker + rmtree).
    # Simulate by having the row iterator itself fire the abort
    # mid-drain — the post-staging marker check must sweep the
    # recreated staging dir (zombie file included) and fail the task.
    writer2 = BatchedApiWriter({"path": target, "batch_size": 10}, False)

    def draining_batches():
        yield batch  # task is mid-drain: staging file exists now
        writer2.abort([])  # driver aborts underneath it
        yield batch  # straggler keeps writing after the rmtree

    with pytest.raises(RuntimeError, match="aborted during write"):
        writer2.write(draining_batches())
    assert not os.path.exists(_staging_dir(target))

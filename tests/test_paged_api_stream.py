"""Streaming paginated-API connector: the checkpointed page-cursor
offset must resume — a restart against a grown feed ingests ONLY the
new pages (no re-reads, no gaps), exactly the semantics of the
reference's persisted pageToken cursor."""

from __future__ import annotations

from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.sources.paged_api import register


def _drain(spark, pages, page_size, out_dir, ckpt_dir):
    stream = (
        spark.readStream.format("paged_api_sim")
        .option("pages", pages)
        .option("page_size", page_size)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_restart_resumes_from_committed_page(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _drain(spark, pages=4, page_size=100, out_dir=out, ckpt_dir=ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 400
    assert first.select(F.max("page")).first()[0] == 3

    # the feed grows; the SAME checkpoint must ingest only pages 4-7
    _drain(spark, pages=8, page_size=100, out_dir=out, ckpt_dir=ckpt)
    second = spark.read.parquet(out)
    assert second.count() == 800  # no page re-read, no page skipped
    per_page = dict(
        second.groupBy("page").count().collect()
    )
    assert per_page == {p: 100 for p in range(8)}


def test_batch_read_retries_transient_page_failures(spark, tmp_path):
    """Option-driven retry (the reference's sleep-and-retry loop as a
    connector option): with failOnceDir injecting one transient error
    per page, maxRetries=2 must re-request inside the partition read
    and produce the identical result as a fault-free read."""
    register(spark)
    fault_dir = tmp_path / "faults"
    fault_dir.mkdir()
    faulty = (
        spark.read.format("paged_api_sim")
        .option("pages", 3)
        .option("page_size", 50)
        .option("maxRetries", 2)
        .option("backoffMs", 1)
        .option("failOnceDir", str(fault_dir))
        .load()
    )
    clean = (
        spark.read.format("paged_api_sim")
        .option("pages", 3)
        .option("page_size", 50)
        .load()
    )
    got = sorted(faulty.collect())
    assert got == sorted(clean.collect())
    assert len(got) == 150
    # every page actually exercised the fault path
    markers = sorted(p.name for p in fault_dir.iterdir())
    assert markers == ["page_0", "page_1", "page_2"]


def test_batch_read_exhausted_retries_surface_the_error(spark, tmp_path):
    """maxRetries=0 with an injected fault must fail loudly (the
    outer Spark task retry then owns recovery) — a silent empty page
    would be data loss."""
    import pytest

    register(spark)
    fault_dir = tmp_path / "faults0"
    fault_dir.mkdir()
    df = (
        spark.read.format("paged_api_sim")
        .option("pages", 1)
        .option("page_size", 10)
        .option("maxRetries", 0)
        .option("failOnceDir", str(fault_dir))
        .load()
    )
    with pytest.raises(Exception, match="failed after 1 attempts|simulated transient"):
        df.collect()


def test_stream_read_retries_transient_page_failures(spark, tmp_path):
    """The STREAMING reader shares the retry path: a one-shot fault on
    every page of a micro-batch is absorbed by maxRetries and the
    drained result matches the fault-free feed."""
    register(spark)
    fault_dir = tmp_path / "sfaults"
    fault_dir.mkdir()
    out = str(tmp_path / "rout")
    ckpt = str(tmp_path / "rckpt")
    stream = (
        spark.readStream.format("paged_api_sim")
        .option("pages", 3)
        .option("page_size", 40)
        .option("maxRetries", 2)
        .option("failOnceDir", str(fault_dir))
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 120
    assert dict(got.groupBy("page").count().collect()) == {0: 40, 1: 40, 2: 40}

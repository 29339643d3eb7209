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

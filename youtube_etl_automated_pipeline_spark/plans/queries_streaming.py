"""Windowed/sessionized event queries — batch and true-streaming
forms of the SAME plan builders (streaming.incremental). The
streaming entry runs Structured Streaming end-to-end (availableNow ->
memory sink) and is oracle-checked against DuckDB like any batch
query: complete-mode output over a fully-consumed source equals the
batch aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from youtube_etl_automated_pipeline_spark.sources import load_table
from youtube_etl_automated_pipeline_spark.streaming.incremental import (
    read_events_stream,
    run_stream_to_memory,
    session_window_agg,
    tumbling_window_agg,
)


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling rollup per event_type (batch form)."""
    return tumbling_window_agg(load_table(spark, sf_dir, "events")).orderBy(
        "window_start", "event_type"
    )


def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-minute-gap sessionization (batch form)."""
    return session_window_agg(load_table(spark, sf_dir, "events")).orderBy(
        "user_id", "session_start"
    )


def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME tumbling rollup executed by the streaming engine:
    file-stream source -> watermark -> stateful window agg ->
    availableNow -> memory sink."""
    stream = read_events_stream(spark, sf_dir)
    result = tumbling_window_agg(stream)
    return run_stream_to_memory(result, "tumbling_counts").orderBy(
        "window_start", "event_type"
    )


QUERIES_STREAMING = {
    "events_tumbling_window": events_tumbling_window,
    "events_session_window": events_session_window,
    "streaming_tumbling_window": streaming_tumbling_window,
}

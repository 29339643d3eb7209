"""Structured Streaming paths: foreachBatch keep-last upsert state
sink and session-window invariants."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from youtube_etl_automated_pipeline_spark.sources import load_table
from youtube_etl_automated_pipeline_spark.streaming.incremental import (
    EVENTS_RAW_SCHEMA,
    run_upsert_stream,
    session_window_agg,
)


def test_foreach_batch_upsert_keep_last(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    base = load_table(spark, SF_SMOKE, "events").limit(200)
    later = base.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")).withColumn(
        "value", F.col("value") * 2
    )
    # duplicated keys in one source: keep-last by ts must pick `later`
    base.unionByName(later).select(
        "event_id",
        F.unix_micros("ts").alias("us"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).withColumn("ts", F.expr("us * 1000")).drop("us").coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    run_upsert_stream(stream, state, ckpt)

    out = spark.read.parquet(state)
    assert out.count() == 200
    assert out.select("event_id").distinct().count() == 200
    # every surviving row is the doubled (later) copy
    expect = {r["event_id"]: r["value"] for r in later.collect()}
    for r in out.collect():
        assert abs(r["value"] - expect[r["event_id"]]) < 1e-9

    # idempotent catch-up rerun: nothing new -> state unchanged
    run_upsert_stream(stream, state, ckpt)
    assert spark.read.parquet(state).count() == 200
    assert not os.path.exists(state + ".inprogress")


def test_session_window_invariants(spark):
    sessions = session_window_agg(load_table(spark, SF_SMOKE, "events"), gap="30 minutes")
    rows = sessions.orderBy("user_id", "session_start").collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user_rows in by_user.values():
        for a, b in zip(user_rows, user_rows[1:]):
            # next session starts >= 30 min after the last event of the prior
            assert (b["session_start"] - a["session_last"]).total_seconds() >= 1800

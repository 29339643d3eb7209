"""CDC MERGE semantics: tombstone retention, retry idempotency,
multi-batch execution, rerun determinism."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from youtube_etl_automated_pipeline_spark.streaming.merge import (
    CDC_SCHEMA,
    foreach_batch_merge,
    live_rows,
    merge_batch,
    read_state,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_tombstone_blocks_late_lower_seq_update(spark):
    """A delete (seq 10) followed by a LATE-arriving lower-seq update
    (seq 5) in a later batch must keep the key dead — the reason
    tombstones stay in state instead of being dropped at merge time."""
    state = spark.createDataFrame([(1, 100, "S", 0)], CDC_SCHEMA)
    b1 = spark.createDataFrame([(1, None, "D", 10)], CDC_SCHEMA)
    b2 = spark.createDataFrame([(1, 999, "U", 5)], CDC_SCHEMA)
    after = merge_batch(merge_batch(state, b1), b2)
    assert _rows(live_rows(after)) == []
    # and the reverse order of arrival gives the same state (associative)
    after_rev = merge_batch(merge_batch(state, b2), b1)
    assert _rows(after) == _rows(after_rev)


def test_merge_batch_retry_is_noop(spark, tmp_path):
    """Re-running foreachBatch with the same batch (Spark's failure
    retry) must leave the state table unchanged."""
    state_dir = str(tmp_path / "state")
    seed = spark.createDataFrame([(1, 100, "S", 0), (2, 200, "S", 0)], CDC_SCHEMA)
    seed.write.parquet(state_dir)
    batch = spark.createDataFrame(
        [(1, 150, "U", 3), (3, 300, "I", 4), (2, None, "D", 5)], CDC_SCHEMA
    )
    apply_fn = foreach_batch_merge(state_dir)
    apply_fn(batch, 0)
    once = _rows(read_state(spark, state_dir))
    apply_fn(batch, 0)  # retry
    assert _rows(read_state(spark, state_dir)) == once
    assert _rows(live_rows(read_state(spark, state_dir))) == [
        (1, 150, "U", 3),
        (3, 300, "I", 4),
    ]


def test_cdc_gate_runs_three_batches_and_is_rerunnable(spark):
    """The gate query must execute as a REAL multi-batch stream
    (3 offsets committed) and produce identical output when re-run
    from scratch."""
    from youtube_etl_automated_pipeline_spark.plans.queries_streaming import (
        streaming_merge_cdc,
    )

    first = _rows(streaming_merge_cdc(spark, SF_SMOKE))
    sf_tag = os.path.basename(os.path.normpath(SF_SMOKE))
    # run/ is the per-invocation dir (fixture/ is the memoized source
    # files + base snapshot shared across runs)
    commits = os.path.join(
        "/tmp/spark_graft_cdc", sf_tag, "run", "ckpt", "commits"
    )
    done = [f for f in os.listdir(commits) if not f.startswith(".")]
    assert sorted(done) == ["0", "1", "2"]
    assert len(first) > 0
    assert _rows(streaming_merge_cdc(spark, SF_SMOKE)) == first


def test_cdc_delete_and_insert_sets(spark):
    """Spot-check op semantics against directly derived expectations:
    every %7==0 base key is gone, every inserted key is present."""
    from youtube_etl_automated_pipeline_spark.plans.queries_streaming import (
        streaming_merge_cdc,
    )
    from youtube_etl_automated_pipeline_spark.sources import load_table

    res = streaming_merge_cdc(spark, SF_SMOKE)
    orders = load_table(spark, SF_SMOKE, "orders")
    deleted = {
        r.o_orderkey
        for r in orders.filter(F.col("o_orderkey") % 7 == 0).collect()
    }
    inserted = {
        r.o_orderkey + 100_000_000
        for r in orders.filter(F.col("o_orderkey") % 11 == 0).collect()
    }
    keys = {r.key for r in res.collect()}
    assert not (keys & deleted)
    assert inserted <= keys

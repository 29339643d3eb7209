from youtube_etl_automated_pipeline_spark.streaming.incremental import (
    foreach_batch_upsert,
    read_events_stream,
    run_stream_to_memory,
    session_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "foreach_batch_upsert",
    "read_events_stream",
    "run_stream_to_memory",
    "session_window_agg",
    "tumbling_window_agg",
]

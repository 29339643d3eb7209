from youtube_etl_automated_pipeline_spark.sources.readers import (
    TESTDATA_TABLES,
    load_json_dim,
    load_table,
    materialize_format,
    materialize_partitioned_events,
    materialize_zordered_orders,
    read_jsonl,
    read_jsonl_quarantined,
    read_orc,
    read_xml,
    widen_scan,
    register_views,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_json_dim",
    "load_table",
    "materialize_format",
    "materialize_partitioned_events",
    "materialize_zordered_orders",
    "read_jsonl",
    "read_jsonl_quarantined",
    "read_orc",
    "read_xml",
    "register_views",
    "widen_scan",
]

from youtube_etl_automated_pipeline_spark.sources.readers import (
    TESTDATA_TABLES,
    load_json_dim,
    load_table,
    widen_scan,
    register_views,
)

__all__ = ["TESTDATA_TABLES", "load_json_dim", "load_table", "register_views", "widen_scan"]

"""PySpark-native analytics engine with the query/data-processing
capabilities of RimshaIshfaq/Youtube-ETL-Automated-Pipeline.

Spark-first re-expression of the reference's dataflow (see SURVEY.md):
the seven-process sheet-mutating pipeline becomes one lazy DataFrame
plan (scan -> enrich joins -> window dedup -> agg -> derive -> write),
dims are broadcast, state lives in Parquet, and incremental flow is
Structured Streaming ``foreachBatch``.

Design posture is 100 TB scale: no ``collect()`` in operators, facts
are never broadcast, dedup uses windows (not ``dropDuplicates``), AQE
is on, and every join declares which side is broadcastable.
"""

__version__ = "0.1.0"

from youtube_etl_automated_pipeline_spark.session import get_spark
from youtube_etl_automated_pipeline_spark.sources import (
    load_json_dim,
    load_table,
    register_views,
    load_wide,
    widen_scan,
)
from youtube_etl_automated_pipeline_spark.pipeline import build_wide_fact
from youtube_etl_automated_pipeline_spark.sinks import (
    append_table,
    dedup_table_swap,
    flush,
    overwrite_table,
    truncate_staging,
    write_bucketed,
)

__all__ = [
    "get_spark",
    "load_json_dim",
    "load_table",
    "register_views",
    "load_wide",
    "widen_scan",
    "build_wide_fact",
    "append_table",
    "dedup_table_swap",
    "flush",
    "overwrite_table",
    "truncate_staging",
    "write_bucketed",
]

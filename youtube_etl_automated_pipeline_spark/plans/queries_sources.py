"""Source-format breadth gate queries: the same rollup computed over
documents re-materialized as JSON-lines and as ORC. The DuckDB oracle
runs the rollup over the ORIGINAL parquet — equality proves the
format round-trip (write → schema-on-read scan → aggregate) is
lossless for every column.

Scale notes: both scans are single-pass and column-pruned; JSONL
requires the explicit schema (no 100 TB inference pass — see
sources.read_jsonl), ORC gets the same pushdown/pruning treatment as
parquet. The rollup touches every column (ids, strings incl. the
full text body, lengths) so silent truncation or type drift cannot
hide.

Reference parity: the reference ingests JSON API payloads row-wise
into pandas (Python-pipeline/dataingestion1.py); here the JSON path
is a declarative schema'd scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from youtube_etl_automated_pipeline_spark.sources import (
    materialize_format,
    read_jsonl,
    read_orc,
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _doc_rollup(docs: DataFrame) -> DataFrame:
    """Every-column rollup: any loss in the round-trip breaks it."""
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length("text")).alias("sum_text_len"),
        )
        .orderBy("lang", "source")
    )


def jsonl_documents_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = materialize_format(spark, sf_dir, "documents", "jsonl")
    return _doc_rollup(read_jsonl(spark, path, DOCUMENTS_SCHEMA))


def orc_documents_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = materialize_format(spark, sf_dir, "documents", "orc")
    return _doc_rollup(read_orc(spark, path))


QUERIES_SOURCES = {
    "jsonl_documents_rollup": jsonl_documents_rollup,
    "orc_documents_rollup": orc_documents_rollup,
}

_ROLLUP_SQL = """
SELECT lang, source,
       count(*) AS n_docs,
       min(doc_id) AS min_doc,
       max(doc_id) AS max_doc,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(length(text)) AS BIGINT) AS sum_text_len
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""

ORACLES_SOURCES = {
    "jsonl_documents_rollup": _ROLLUP_SQL,
    "orc_documents_rollup": _ROLLUP_SQL,
}

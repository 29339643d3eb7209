"""Corrupt-record quarantine: malformed JSONL rows route to an audit
leg instead of nulling silently or failing the ingest."""

from __future__ import annotations

from pyspark.sql import types as T

from youtube_etl_automated_pipeline_spark.sources import read_jsonl_quarantined

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_quarantine_routes_malformed_lines(spark, tmp_path):
    path = tmp_path / "in.jsonl"
    lines = [
        '{"doc_id": 1, "text": "ok one"}',
        "this is not json at all",
        '{"doc_id": 2, "text": "ok two"}',
        '{"doc_id": 3, "text": "truncated',
        '{"doc_id": 4, "text": "ok three"}',
    ]
    path.write_text("\n".join(lines) + "\n")

    good, quarantine = read_jsonl_quarantined(spark, str(path), SCHEMA)
    # consume the shared scan once so the corrupt-column-only
    # projection restriction (SPARK-21610) never bites
    good = good.cache()
    assert sorted(r.doc_id for r in good.collect()) == [1, 2, 4]
    bad = sorted(r.raw_line for r in quarantine.collect())
    assert bad == ["this is not json at all", '{"doc_id": 3, "text": "truncated']
    good.unpersist()

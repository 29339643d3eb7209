"""S5: JSON dim scan -> broadcast dim with last-wins dup resolution
(the reference's dict-comprehension overwrite: dataingestion3.py:37,
65 dup codes and null show names in Documents/showname.json)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from youtube_etl_automated_pipeline_spark.operators.dedup import dedup_audit
from youtube_etl_automated_pipeline_spark.operators.joins import dim_last_wins
from youtube_etl_automated_pipeline_spark.sources import load_json_dim


def test_json_dim_last_wins_and_nulls(spark, tmp_path):
    rows = [
        {"Code": "AB", "Show_Name": "First", "Broadcaster": "X", "Category": "News"},
        {"Code": "CD", "Show_Name": None, "Broadcaster": "Y", "Category": "Drama"},
        {"Code": "AB", "Show_Name": "Second", "Broadcaster": "Z", "Category": "Sports"},
    ]
    path = tmp_path / "showname.json"
    path.write_text(json.dumps(rows))

    dim = load_json_dim(spark, str(path))
    assert dim.count() == 3

    # last-wins needs a file-order sequence (dict overwrite order)
    seq = dim.withColumn("_seq", F.monotonically_increasing_id())
    deduped = dim_last_wins(seq, "Code", ["_seq"])
    assert dedup_audit(seq, deduped) == 1

    out = {r["Code"]: r for r in deduped.collect()}
    assert out["AB"]["Show_Name"] == "Second"  # later row overwrote
    assert out["AB"]["Broadcaster"] == "Z"
    assert out["CD"]["Show_Name"] is None  # present-but-null preserved

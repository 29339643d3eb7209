"""Multimodal plumbing: mapInPandas schemas, stub gating, kernel
correctness against pure-python recomputation."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from youtube_etl_automated_pipeline_spark.ext.multimodal import (
    byte_stats,
    decode_image_features,
    frame_sample,
    to_media_table,
)
from youtube_etl_automated_pipeline_spark.sources import load_table


@pytest.fixture(scope="module")
def media(spark):
    return to_media_table(load_table(spark, SF_SMOKE, "documents")).cache()


def test_decode_stub_requires_decoder(spark, media):
    with pytest.raises(NotImplementedError):
        decode_image_features(media)


def test_byte_stats_matches_python(spark, media):
    out = {r["media_id"]: r for r in byte_stats(media).collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.limit(50).collect()}
    assert len(out) == media.count()
    for mid, payload in src.items():
        r = out[mid]
        assert r["n_bytes"] == len(payload)
        assert r["byte_sum"] == sum(payload)
        assert len(r["hist"]) == 8
        assert sum(r["hist"]) == len(payload)
        if payload:
            assert r["byte_min"] == min(payload)
            assert r["byte_max"] == max(payload)


def test_frame_sample_matches_python(spark, media):
    out = frame_sample(media).collect()
    rows = {(r["media_id"], r["frame_idx"]): r for r in out}
    videos = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("media_type = 'video'").collect()
    }
    assert videos, "expected some video rows"
    expected = {}
    for mid, payload in videos.items():
        n_frames = (len(payload) + 63) // 64
        for i in range(0, n_frames, 2):
            chunk = payload[i * 64 : (i + 1) * 64]
            expected[(mid, i)] = (len(chunk), sum(chunk))
    assert set(rows) == set(expected)
    for key, (flen, fsum) in expected.items():
        assert rows[key]["frame_len"] == flen
        assert rows[key]["frame_sum"] == fsum

"""Multimodal plumbing: mapInPandas schemas, real PNG codec, kernel
correctness against pure-python recomputation."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMOKE
from youtube_etl_automated_pipeline_spark.ext.multimodal import (
    byte_stats,
    decode_image_features,
    default_image_decoder,
    encode_png_gray,
    fake_gray_decoder,
    frame_sample,
    png_encode_images,
    png_gray_decoder,
    to_media_table,
)
from youtube_etl_automated_pipeline_spark.sources import load_table


@pytest.fixture(scope="module")
def media(spark):
    return to_media_table(load_table(spark, SF_SMOKE, "documents")).cache()


def test_default_decoder_rejects_unknown_codec(spark, media):
    # raw text bytes are not a PNG; without PIL the dispatch must fail
    # loudly rather than silently misinterpret the payload
    with pytest.raises((NotImplementedError, ValueError)):
        default_image_decoder(b"definitely not a png payload")


def test_png_roundtrip_all_filters():
    # >= 5 rows so every RFC 2083 filter type (row % 5) is exercised;
    # values chosen to stress wraparound (mod-256) in Sub/Up/Paeth
    rng = np.random.default_rng(7)
    for h, w in [(5, 5), (8, 3), (16, 16), (2, 2), (7, 31)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        png = encode_png_gray(img)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        out = png_gray_decoder(png)
        assert out.dtype == np.uint8
        assert np.array_equal(out, img)


def test_png_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        png_gray_decoder(b"JFIF not a png")


def test_png_encode_images_decodes_to_fixture_matrix(spark, media):
    # the PNG-encoded payload must decode to exactly the matrix the
    # raw-bytes interpretation produces — lossless codec roundtrip
    encoded = {
        r["media_id"]: bytes(r["payload"])
        for r in png_encode_images(media).collect()
    }
    raw = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("media_type = 'image'").collect()
    }
    checked = 0
    for mid, payload in raw.items():
        img = fake_gray_decoder(payload)
        if img.shape[0] < 2:
            assert mid not in encoded
            continue
        assert np.array_equal(png_gray_decoder(encoded[mid]), img)
        checked += 1
    assert checked > 0


def test_image_features_no_injection(spark, media):
    # the full gate path: PNG encode -> default (pure-numpy) decode
    out = decode_image_features(png_encode_images(media)).collect()
    assert out
    by_id = {r["media_id"]: r for r in out}
    src = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("media_type = 'image'").collect()
    }
    for mid, payload in src.items():
        img = fake_gray_decoder(payload)
        w = img.shape[0]
        if w < 2:
            assert mid not in by_id
            continue
        r = by_id[mid]
        assert r["width"] == w
        assert abs(r["mean_pixel"] - img.sum() / img.size) < 1e-5


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


def test_phash_dedup_captures_every_exact_duplicate(spark, media):
    """Banding guarantee: two images with IDENTICAL pixels have all
    four dHash bands equal, so every exact-duplicate pair MUST appear
    in the phash candidate output with hamming 0 — the recall floor
    of the LSH scheme (near-dups are best-effort; exact dups are
    contractual)."""
    import collections

    from youtube_etl_automated_pipeline_spark.plans.queries_multimodal import (
        multimodal_phash_dedup,
    )
    from tests.conftest import SF_SMOKE

    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in media.filter("media_type = 'image'").collect()
    }
    groups = collections.defaultdict(list)
    for mid, p in payloads.items():
        import math

        w = math.isqrt(len(p))
        if w >= 9:
            groups[p[: w * w]].append(mid)
    expected = set()
    for ids in groups.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                expected.add((ids[i], ids[j]))
    assert expected, "fixture must contain exact-duplicate images"
    got = {
        (r["media_a"], r["media_b"]): r["hamming_bits"]
        for r in multimodal_phash_dedup(spark, SF_SMOKE).collect()
    }
    for pair in expected:
        assert pair in got and got[pair] == 0, (pair, got.get(pair))


def test_png_roundtrip_fused_equals_chained(spark, media):
    """The fused one-Python-stage operator must produce exactly the
    rows of the two-stage decode_image_features(png_encode_images(.))
    composition (it composes the same kernels; this pins it)."""
    from youtube_etl_automated_pipeline_spark.ext.multimodal import (
        png_roundtrip_features,
    )

    fused = sorted(map(tuple, png_roundtrip_features(media).collect()))
    chained = sorted(
        map(tuple, decode_image_features(png_encode_images(media)).collect())
    )
    assert fused == chained and len(fused) > 0

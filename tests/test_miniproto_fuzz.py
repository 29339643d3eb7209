"""Property-based fuzzing for the vendored miniproto runtime and the
pure-numpy PNG codec — the two hand-written binary-format components
added in round 3. Hypothesis generates adversarial values; the
invariants are exact roundtrips."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from youtube_etl_automated_pipeline_spark.ext.multimodal import (
    encode_png_gray,
    png_gray_decoder,
)
from youtube_etl_automated_pipeline_spark.session import ensure_protobuf

ensure_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402

from youtube_etl_automated_pipeline_spark.vendor.google.protobuf import (  # noqa: E402
    _mini,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
U32 = st.integers(min_value=0, max_value=2**32 - 1)


@settings(max_examples=300, deadline=None)
@given(I64)
def test_varint_signed64_roundtrip(v):
    enc = _mini._enc_varint(v)
    dec, pos = _mini._dec_varint(enc, 0)
    assert pos == len(enc)
    assert _mini._to_signed64(dec) == v


@settings(max_examples=200, deadline=None)
@given(
    st.text(max_size=40),
    st.text(max_size=40),
    st.integers(min_value=0, max_value=2**62),
)
def test_state_call_command_roundtrip(state_name, schema, ttl_ms):
    cmd = sm.StateCallCommand(stateName=state_name, schema=schema)
    cmd.ttl.durationMs = ttl_ms
    back = sm.StateCallCommand()
    back.ParseFromString(cmd.SerializeToString())
    assert back.stateName == state_name
    assert back.schema == schema
    assert back.ttl.durationMs == ttl_ms


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.text(max_size=60),
    st.lists(st.binary(max_size=30), max_size=8),
    st.booleans(),
)
def test_list_get_response_roundtrip(status, err, chunks, rnf):
    msg = sm.StateResponseWithListGet(
        statusCode=status,
        errorMessage=err,
        value=chunks,
        requireNextFetch=rnf,
    )
    back = sm.StateResponseWithListGet()
    back.ParseFromString(msg.SerializeToString())
    assert back.statusCode == status
    assert back.errorMessage == err
    assert list(back.value) == chunks
    # absent bool parses to its proto3 default
    assert back.requireNextFetch == rnf


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_random_images(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(png_gray_decoder(encode_png_gray(img)), img)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=2, max_value=64))
def test_png_roundtrip_adversarial_rows(w):
    # rows crafted to stress each filter's wraparound: constant 255,
    # alternating 0/255, ascending ramp, descending ramp, zeros
    rows = [
        np.full(w, 255, dtype=np.uint8),
        np.tile(np.array([0, 255], dtype=np.uint8), (w + 1) // 2)[:w],
        (np.arange(w) % 256).astype(np.uint8),
        (255 - np.arange(w) % 256).astype(np.uint8),
        np.zeros(w, dtype=np.uint8),
        np.full(w, 128, dtype=np.uint8),
    ]
    img = np.stack(rows)
    assert np.array_equal(png_gray_decoder(encode_png_gray(img)), img)

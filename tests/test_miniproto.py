"""Unit tests for the vendored miniproto runtime
(youtube_etl_automated_pipeline_spark/vendor/google/protobuf).

These exercise the shim directly against the REAL protoc-generated
pyspark StateMessage_pb2 module — the exact consumer it exists for —
plus wire-level edge cases (negative ints, large varints, presence
semantics of auto-vivified sub-messages)."""

from __future__ import annotations

import pytest

from youtube_etl_automated_pipeline_spark.session import ensure_protobuf

ensure_protobuf()

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")

from youtube_etl_automated_pipeline_spark.vendor.google.protobuf import (  # noqa: E402
    _mini,
)


def test_varint_roundtrip_edges():
    for v in [0, 1, 127, 128, 300, 2**31 - 1, 2**63 - 1, -1, -2**31, -2**63]:
        enc = _mini._enc_varint(v)
        dec, pos = _mini._dec_varint(enc, 0)
        assert pos == len(enc)
        if v >= 0:
            assert dec == v
        else:
            assert _mini._to_signed64(dec) == v


def test_request_roundtrip_through_own_parser():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.DATA_PROCESSED)
        )
    )
    data = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert back.statefulProcessorCall.setHandleState.state == sm.DATA_PROCESSED


def test_attribute_set_and_nested_autovivify_presence():
    cmd = sm.StateCallCommand()
    cmd.stateName = "peak"
    cmd.schema = '{"type":"struct"}'
    # reading a sub-message field must NOT make it present
    _ = cmd.ttl
    data_without = cmd.SerializeToString()
    # writing through the returned child MUST make it present
    cmd.ttl.durationMs = 5000
    data_with = cmd.SerializeToString()
    assert len(data_with) > len(data_without)
    back = sm.StateCallCommand()
    back.ParseFromString(data_with)
    assert back.stateName == "peak"
    assert back.ttl.durationMs == 5000
    back2 = sm.StateCallCommand()
    back2.ParseFromString(data_without)
    assert not back2.HasField("ttl")


def test_negative_and_large_int64_fields():
    reg = sm.RegisterTimer(expiryTimestampMs=-1)
    back = sm.RegisterTimer()
    back.ParseFromString(reg.SerializeToString())
    assert back.expiryTimestampMs == -1
    reg2 = sm.RegisterTimer(expiryTimestampMs=2**62)
    back2 = sm.RegisterTimer()
    back2.ParseFromString(reg2.SerializeToString())
    assert back2.expiryTimestampMs == 2**62


def test_repeated_bytes_response_parse():
    # hand-encode a StateResponseWithListGet: statusCode=0, two value
    # entries, requireNextFetch=true — field numbers from the parsed
    # descriptor so the test tracks the real proto
    fields = {f.name: f for f in sm.StateResponseWithListGet.DESCRIPTOR.fields}
    val_num = fields["value"].number
    rnf_num = fields["requireNextFetch"].number
    payload = b""
    for chunk in (b"\x01\x02", b"\x03"):
        payload += _mini._enc_varint((val_num << 3) | 2)
        payload += _mini._enc_varint(len(chunk)) + chunk
    payload += _mini._enc_varint((rnf_num << 3) | 0) + _mini._enc_varint(1)
    msg = sm.StateResponseWithListGet()
    msg.ParseFromString(payload)
    assert list(msg.value) == [b"\x01\x02", b"\x03"]
    assert msg.requireNextFetch is True
    assert msg.statusCode == 0 and msg.errorMessage == ""


def test_unknown_fields_are_skipped():
    fields = {f.name: f for f in sm.StateResponse.DESCRIPTOR.fields}
    known = _mini._enc_varint((fields["statusCode"].number << 3) | 0)
    known += _mini._enc_varint(7)
    unknown = _mini._enc_varint((990 << 3) | 2)
    unknown += _mini._enc_varint(3) + b"xyz"
    msg = sm.StateResponse()
    msg.ParseFromString(unknown + known)
    assert msg.statusCode == 7


def test_enum_constants_exported_at_module_level():
    for name in ("PRE_INIT", "CREATED", "INITIALIZED", "DATA_PROCESSED",
                 "TIMER_PROCESSED", "CLOSED"):
        assert isinstance(getattr(sm, name), int)
    assert sm.PRE_INIT != sm.CLOSED

"""Pure-Python protobuf shim (tweetaggregates_spark.pbshim): wire
bytes pinned against hand-computed canonical protobuf encodings, so
the transformWithState state-server protocol (test_tws.py e2e) rests
on independently-verified encode/decode."""

from __future__ import annotations

from tweetaggregates_spark.pbshim import ensure_protobuf

ensure_protobuf()

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


def test_nested_oneof_message_encoding():
    # StateRequest.statefulProcessorCall (field 2, LEN) ->
    # StatefulProcessorCall.setHandleState (field 1, LEN) ->
    # SetHandleState.state (field 1, varint) = INITIALIZED (2)
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert m.SerializeToString() == bytes.fromhex("12040a020802")


def test_zero_enum_scalar_omitted_but_oneof_message_kept():
    # proto3: the zero-valued enum scalar is omitted, but the oneof's
    # set submessage must still be emitted (empty LEN) so the JVM
    # learns the oneof case
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.PRE_INIT)
        )
    )
    assert m.SerializeToString() == bytes.fromhex("12020a00")


def test_response_defaults_and_bytes_value():
    resp = sm.StateResponse()
    resp.ParseFromString(bytes.fromhex("1a027879"))  # value=b"xy" only
    assert (resp.statusCode, resp.errorMessage, resp.value) == (
        0,
        "",
        b"xy",
    )


def test_repeated_bytes_and_bool_roundtrip():
    lt = sm.ListStatePut(value=[b"a", b"bc"], fetchWithArrow=True)
    enc = lt.SerializeToString()
    assert enc == bytes.fromhex("0a01610a0262631001")
    rt = sm.ListStatePut()
    rt.ParseFromString(enc)
    assert rt.value == [b"a", b"bc"] and rt.fetchWithArrow is True


def test_negative_int64_two_complement_varint():
    reg = sm.RegisterTimer(expiryTimestampMs=-5)
    enc = reg.SerializeToString()
    assert enc == bytes.fromhex("08fbffffffffffffffff01")
    dec = sm.RegisterTimer()
    dec.ParseFromString(enc)
    assert dec.expiryTimestampMs == -5


def test_repeated_message_and_unknown_field_skipped():
    it = sm.StateResponseWithMapIterator(
        statusCode=1,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2", value=b"v2"),
        ],
        requireNextFetch=True,
    )
    dec = sm.StateResponseWithMapIterator()
    # prepend an unknown field (number 15, varint) — must be skipped
    dec.ParseFromString(bytes.fromhex("7807") + it.SerializeToString())
    assert dec.statusCode == 1 and dec.requireNextFetch is True
    assert [(p.key, p.value) for p in dec.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_proto3_optional_presence():
    # TimerInfo.key is proto3 optional (synthetic oneof): absent by
    # default, emitted when set even to the default value
    t = sm.TimerInfo(timestampMs=7)
    assert not t.HasField("key")
    t2 = sm.TimerInfo(key=b"", timestampMs=7)
    assert t2.HasField("key")
    enc = t2.SerializeToString()
    dec = sm.TimerInfo()
    dec.ParseFromString(enc)
    assert dec.HasField("key") and dec.key == b"" and dec.timestampMs == 7

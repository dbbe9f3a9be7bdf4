"""Pure-Python protobuf shim (tweetaggregates_spark.pbshim): wire
bytes pinned against hand-computed canonical protobuf encodings, so
the transformWithState state-server protocol (test_tws.py e2e) rests
on independently-verified encode/decode."""

from __future__ import annotations

import pytest

from tweetaggregates_spark.pbshim import ensure_protobuf

# True when the SHIM was activated (no real protobuf). The wire-byte
# pins below are runtime-agnostic — under real protobuf they
# cross-validate the shim's expected encodings against the genuine
# library; only the shim-internals fuzz test is shim-specific.
SHIM_ACTIVE = ensure_protobuf()

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


@pytest.mark.skipif(
    not SHIM_ACTIVE,
    reason="exercises shim internals (google.protobuf.internal.runtime); "
    "with real protobuf installed the shim is inactive by design",
)
def test_fuzz_roundtrip_all_message_types():
    """Deterministic fuzz: for every message type in the state
    protocol, build an instance with every field populated (scalars at
    awkward values, nested messages one level deep, repeated fields
    with 0/1/3 elements), then SerializeToString -> ParseFromString
    must reproduce the populated fields exactly."""
    # import under the SAME module name the generated pb2 used, so we
    # see the pool instance it populated
    from google.protobuf import descriptor_pool
    from google.protobuf.internal import runtime

    pool = descriptor_pool.Default()

    def _sample(f, depth, salt):
        t = f.type
        if t == runtime.T_BOOL:
            return salt % 2 == 0
        if t in (runtime.T_INT32,):
            return [0, -1, 2**31 - 1, -(2**31)][salt % 4]
        if t in (runtime.T_INT64,):
            return [0, -1, 2**63 - 1, -(2**63)][salt % 4]
        if t in (runtime.T_UINT32, runtime.T_UINT64):
            return [0, 1, 300][salt % 3]
        if t == runtime.T_STRING:
            return ["", "héllo", "x" * 200][salt % 3]
        if t == runtime.T_BYTES:
            return [b"", bytes(range(7)), b"\x00\xff" * 64][salt % 3]
        if t == runtime.T_DOUBLE:
            return [0.0, -1.5, 3.25e300][salt % 3]
        if t == runtime.T_FLOAT:
            return [0.0, -0.5][salt % 2]
        if t == runtime.T_ENUM:
            vals = sorted(f.enum_type.values_by_name.values())
            return vals[salt % len(vals)]
        if t == runtime.T_MESSAGE:
            if depth >= 2:
                return None
            return _build(f.message_type, depth + 1, salt)
        return None

    def _build(desc, depth, salt):
        cls = runtime.make_message_class(desc)
        kwargs = {}
        seen_oneof = set()
        for i, f in enumerate(desc.fields):
            if f.oneof_index is not None:
                # one member per oneof (later assignments would be a
                # real-protobuf overwrite; keep construction simple)
                if f.oneof_index in seen_oneof:
                    continue
                seen_oneof.add(f.oneof_index)
            v = _sample(f, depth, salt + i)
            if v is None:
                continue
            if f.is_repeated:
                n = (salt + i) % 3
                kwargs[f.name] = [v] * n if n else []
            else:
                kwargs[f.name] = v
        return cls(**kwargs)

    def _assert_equal(a, b, desc):
        for name, v in a._values.items():
            got = getattr(b, name)
            f = desc.fields_by_name[name]
            if f.type == runtime.T_MESSAGE:
                items = v if f.is_repeated else [v]
                gots = got if f.is_repeated else [got]
                assert len(items) == len(gots), name
                for x, y in zip(items, gots):
                    _assert_equal(x, y, f.message_type)
            elif f.type == runtime.T_FLOAT:
                vv = v if f.is_repeated else [v]
                gg = got if f.is_repeated else [got]
                for x, y in zip(vv, gg):
                    assert abs(x - y) < 1e-6, name
            else:
                if f.is_repeated:
                    assert list(got) == list(v), name
                elif not f.has_presence and v == f.default():
                    assert got == v, name  # default round-trips as default
                else:
                    assert got == v, name

    checked = 0
    for full_name, desc in sorted(pool.messages.items()):
        for salt in range(4):
            msg = _build(desc, 0, salt)
            enc = msg.SerializeToString()
            dec = runtime.make_message_class(desc)()
            dec.ParseFromString(enc)
            _assert_equal(msg, dec, desc)
            checked += 1
    assert checked >= 4 * 30  # the protocol has 30+ message types

"""Unit tests for the vendored minimal protobuf runtime.

The strongest verification is end-to-end (the JVM's real protobuf parses
every byte in test_streaming_topn_values_stateful_processor); these tests
pin the codec against hand-computed wire vectors from the published spec
(https://protobuf.dev/programming-guides/encoding/) so regressions are
caught without a Spark session.
"""

import sys
import os

import pytest

VENDOR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "sparkstreaming_spark",
    "_vendor",
)


@pytest.fixture(scope="module")
def sm():
    """The real PySpark-generated pb2 module loaded via the shim."""
    if VENDOR not in sys.path:
        sys.path.insert(0, VENDOR)
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_varint_vectors():
    from google.protobuf import _wire as w

    for value, expect in [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (300, b"\xac\x02"),  # the spec's own example
        (5000, b"\x88\x27"),
        ((1 << 64) - 1, b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"),
    ]:
        out = bytearray()
        w.encode_varint(out, value)
        assert bytes(out) == expect, value
        back, pos = w.decode_varint(bytes(out), 0)
        assert back == value and pos == len(expect)


def test_negative_int64_ten_byte_varint():
    from google.protobuf import _wire as w

    out = bytearray()
    w.encode_signed(out, -1)
    assert bytes(out) == b"\xff" * 9 + b"\x01"
    raw, _ = w.decode_varint(bytes(out), 0)
    assert w.to_int64(raw) == -1
    assert w.to_int32(raw) == -1


def test_scalar_message_vector(sm):
    # field 1 (int64 timestampMs is field 2 in TimerInfo): RegisterTimer
    # has expiryTimestampMs = field 1, int64 → tag 0x08.
    msg = sm.RegisterTimer(expiryTimestampMs=150)
    assert msg.SerializeToString() == b"\x08\x96\x01"  # spec example value


def test_string_and_default_skipping(sm):
    # proto3 implicit presence: defaults don't serialize
    cmd = sm.StateCallCommand(stateName="", schema="")
    assert cmd.SerializeToString() == b""
    cmd2 = sm.StateCallCommand(stateName="ab")
    assert cmd2.SerializeToString() == b"\x0a\x02ab"


def test_oneof_set_clears_previous(sm):
    call = sm.StatefulProcessorCall(
        getValueState=sm.StateCallCommand(stateName="a")
    )
    call.getListState.stateName = "b"  # oneof member read does NOT attach
    # reading an unset oneof member must not clear the active member
    assert call.HasField("getValueState")
    call2 = sm.StatefulProcessorCall()
    call2.getValueState.CopyFrom(sm.StateCallCommand(stateName="a"))
    # direct assignment path: kwargs then switch
    sw = sm.StateVariableRequest(
        valueStateCall=sm.ValueStateCall(stateName="v")
    )
    sw2 = sm.StateVariableRequest(
        listStateCall=sm.ListStateCall(stateName="l")
    )
    merged = sm.StateVariableRequest()
    merged.ParseFromString(
        sw.SerializeToString() + sw2.SerializeToString()
    )
    # last oneof member on the wire wins
    assert merged.HasField("listStateCall")
    assert not merged.HasField("valueStateCall")


def test_empty_oneof_message_still_serializes(sm):
    vsc = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    data = vsc.SerializeToString()
    # field1 stateName "s", field2 exists with zero-length payload
    assert data == b"\x0a\x01s\x12\x00"
    back = sm.ValueStateCall()
    back.ParseFromString(data)
    assert back.HasField("exists")


def test_repeated_bytes_roundtrip(sm):
    put = sm.ListStatePut(value=[b"x", b"", b"yz"], fetchWithArrow=True)
    data = put.SerializeToString()
    # unpacked length-delimited per element; empty element still emitted
    assert data == b"\x0a\x01x\x0a\x00\x0a\x02yz\x10\x01"
    back = sm.ListStatePut()
    back.ParseFromString(data)
    assert list(back.value) == [b"x", b"", b"yz"]
    assert back.fetchWithArrow is True


def test_repeated_message_parse_and_add(sm):
    resp = sm.StateResponseWithTimer()
    t = resp.timer.add(timestampMs=7)
    assert t.timestampMs == 7
    data = resp.SerializeToString()
    back = sm.StateResponseWithTimer()
    back.ParseFromString(data)
    assert [x.timestampMs for x in back.timer] == [7]


def test_unknown_fields_skipped(sm):
    # append an unknown field (number 15, varint) — parse must not fail
    data = sm.RegisterTimer(expiryTimestampMs=1).SerializeToString()
    data += b"\x78\x2a"  # field 15 varint 42
    msg = sm.RegisterTimer()
    msg.ParseFromString(data)
    assert msg.expiryTimestampMs == 1


def test_proto3_optional_presence(sm):
    ti = sm.TimerInfo(timestampMs=5)
    assert not ti.HasField("key")
    ti2 = sm.TimerInfo(key=b"", timestampMs=5)
    # explicitly-set empty optional bytes must serialize (presence!)
    assert ti2.HasField("key")
    data = ti2.SerializeToString()
    back = sm.TimerInfo()
    back.ParseFromString(data)
    assert back.HasField("key") and back.key == b""


def test_nested_autovivification_attaches(sm):
    cmd = sm.StateCallCommand()
    cmd.ttl.durationMs = 9
    assert cmd.SerializeToString() == b"\x22\x02\x08\x09"


def test_enum_module_constants(sm):
    assert (sm.PRE_INIT, sm.CREATED, sm.CLOSED) == (0, 1, 5)
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"
    assert sm.HandleState.Value("TIMER_PROCESSED") == 4
    shs = sm.SetHandleState(state=sm.CLOSED)
    assert shs.SerializeToString() == b"\x08\x05"
    # default enum value (PRE_INIT=0) does not serialize
    assert sm.SetHandleState(state=sm.PRE_INIT).SerializeToString() == b""


def test_full_request_roundtrip(sm):
    cmd = sm.StateCallCommand(stateName="topn", schema="vals array<double>")
    cmd.ttl.durationMs = 5000
    req = sm.StateRequest(
        version=2,
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd),
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.version == 2
    inner = back.statefulProcessorCall.getValueState
    assert inner.stateName == "topn"
    assert inner.schema == "vals array<double>"
    assert inner.ttl.durationMs == 5000


def test_packed_numeric_parse():
    """No packed fields exist in StateMessage.proto; pin the generic path
    with a synthetic descriptor."""
    from google.protobuf import _bootstrap as bp
    from google.protobuf import _message as mm

    fp = bp.FieldProto(name="xs", number=1, label=3, type=bp.TYPE_INT32)
    proto = bp.MessageProto(name="P", fields=[fp])
    cls = mm.build_message_class(proto, "t")
    msg = cls(xs=[3, 270, -1])
    data = msg.SerializeToString()
    # packed: tag 0x0a, len, then varints (−1 is ten bytes)
    assert data[0] == 0x0A
    back = cls()
    back.ParseFromString(data)
    assert list(back.xs) == [3, 270, -1]
    # unpacked form must parse identically
    unpacked = b"\x08\x03" + b"\x08\x8e\x02" + b"\x08" + b"\xff" * 9 + b"\x01"
    back2 = cls()
    back2.ParseFromString(unpacked)
    assert list(back2.xs) == [3, 270, -1]


def test_roundtrip_fuzz(sm):
    """Property fuzz over the real StateMessage schema: arbitrary field
    settings survive serialize→parse bit-exactly (values, oneof winner,
    repeated order)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        status=st.integers(min_value=-(2**31), max_value=2**31 - 1),
        err=st.text(max_size=40),
        vals=st.lists(st.binary(max_size=30), max_size=8),
        fetch=st.booleans(),
        ts=st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=5
        ),
    )
    def roundtrip(status, err, vals, fetch, ts):
        msg = sm.StateResponseWithListGet(
            statusCode=status, errorMessage=err, value=vals,
            requireNextFetch=fetch,
        )
        back = sm.StateResponseWithListGet()
        back.ParseFromString(msg.SerializeToString())
        assert back.statusCode == status
        assert back.errorMessage == err
        assert list(back.value) == vals
        assert back.requireNextFetch == fetch

        timer = sm.StateResponseWithTimer(
            timer=[sm.TimerInfo(timestampMs=t) for t in ts]
        )
        back2 = sm.StateResponseWithTimer()
        back2.ParseFromString(timer.SerializeToString())
        assert [x.timestampMs for x in back2.timer] == ts

    roundtrip()

"""Vendored mini-protobuf runtime (r7 verdict ask #6): wire-format
unit tests against the real StateMessage gencode, plus semantics the
state-server clients depend on.  The end-to-end JVM interop proof is
test_streaming.py::test_streaming_consensus_tws_executes_with_protobuf
— the JVM parses our bytes with real protobuf-java, so any encoding
bug fails that test loudly."""

from __future__ import annotations

import pytest

from aroa_etl_spark.streaming.protoshim import ensure_protobuf

_MODE = ensure_protobuf()
_shim_only = pytest.mark.skipif(
    _MODE != "vendored",
    reason="pins shim-specific write semantics; with the real protobuf "
    "runtime installed the portable wire-level tests below cover it",
)

from pyspark.sql.streaming.proto import StateMessage_pb2 as sm  # noqa: E402

from aroa_etl_spark._vendor.google.protobuf import _minipb  # noqa: E402


def test_varint_boundaries():
    for v in (0, 1, 127, 128, 300, 2**31 - 1, 2**32, 2**63 - 1):
        enc = _minipb.encode_varint(v)
        dec, pos = _minipb.decode_varint(enc, 0)
        assert dec == v and pos == len(enc)
    # negatives: 64-bit two's complement, 10 bytes
    enc = _minipb.encode_varint(-1)
    assert len(enc) == 10
    dec, _ = _minipb.decode_varint(enc, 0)
    assert dec == (1 << 64) - 1


def test_known_wire_bytes():
    """Pin a hand-computed encoding: field 1 (varint) = 150 is the
    protobuf docs' canonical `08 96 01` example."""
    msg = sm.StateResponse(statusCode=150)
    assert msg.SerializeToString() == b"\x08\x96\x01"
    # string field: tag 0x12, length, utf-8 payload
    msg2 = sm.StateResponse(errorMessage="hi")
    assert msg2.SerializeToString() == b"\x12\x02hi"


def test_proto3_implicit_presence_skips_defaults():
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""


@_shim_only
def test_oneof_set_clears_sibling():
    # direct composite assignment is shim-only (the real runtime
    # requires CopyFrom); the wire-level last-wins semantics are pinned
    # portably in test_oneof_last_wins_on_wire below
    call = sm.ValueStateCall(stateName="v", exists=sm.Exists())
    assert call.WhichOneof("method") == "exists"
    call.get = sm.Get()
    assert call.WhichOneof("method") == "get"
    assert not call.HasField("exists")
    raw = call.SerializeToString()
    parsed = sm.ValueStateCall()
    parsed.ParseFromString(raw)
    assert parsed.WhichOneof("method") == "get"


def test_oneof_last_wins_on_wire():
    """proto3: when wire data carries two members of the same oneof,
    the LAST one wins — portable across the shim and the real
    runtime (review finding: the shim's parse previously left both
    present)."""
    # ValueStateCall: exists = field 2, get = field 3, both empty msgs
    raw = (
        _minipb.encode_tag(2, 2) + _minipb.encode_varint(0)
        + _minipb.encode_tag(3, 2) + _minipb.encode_varint(0)
    )
    msg = sm.ValueStateCall()
    msg.ParseFromString(raw)
    assert msg.WhichOneof("method") == "get"
    assert not msg.HasField("exists")
    # reversed order: exists wins
    raw2 = (
        _minipb.encode_tag(3, 2) + _minipb.encode_varint(0)
        + _minipb.encode_tag(2, 2) + _minipb.encode_varint(0)
    )
    msg2 = sm.ValueStateCall()
    msg2.ParseFromString(raw2)
    assert msg2.WhichOneof("method") == "exists"


def test_truncated_length_field_raises():
    """A length-delimited field whose declared size overruns the buffer
    must raise, not silently truncate (review finding)."""
    raw = _minipb.encode_tag(3, 2) + _minipb.encode_varint(100) + b"short"
    with pytest.raises(Exception):
        sm.StateResponse().ParseFromString(raw)


def test_repeated_iadd_and_insert_reach_the_wire():
    """+= and insert on a vivified repeated field must mark the parent
    chain present (review finding: unhooked mutators silently dropped
    data from the wire)."""
    req = sm.StateRequest()
    req.stateVariableRequest.listStateCall.appendList.value += [b"x"]
    raw = req.SerializeToString()
    out = sm.StateRequest()
    out.ParseFromString(raw)
    assert list(out.stateVariableRequest.listStateCall.appendList.value) == [b"x"]
    lst = sm.ListStatePut()
    lst.value.insert(0, b"first")
    out2 = sm.ListStatePut()
    out2.ParseFromString(lst.SerializeToString())
    assert list(out2.value) == [b"first"]


def test_vivification_read_does_not_mark_presence():
    cmd = sm.StateCallCommand(stateName="s")
    _ = cmd.ttl.durationMs  # read-only touch
    assert not cmd.HasField("ttl")
    # exactly the stateName bytes — no field-4 (ttl) header at all
    assert cmd.SerializeToString() == b"\x0a\x01s"
    cmd.ttl.durationMs = 7
    assert cmd.HasField("ttl")
    parsed = sm.StateCallCommand()
    parsed.ParseFromString(cmd.SerializeToString())
    assert parsed.ttl.durationMs == 7


def test_repeated_message_and_bytes_roundtrip():
    resp = sm.StateResponseWithMapIterator(
        statusCode=1,
        kvPair=[
            sm.KeyAndValuePair(key=b"a", value=b"1"),
            sm.KeyAndValuePair(key=b"b", value=b"2"),
        ],
        requireNextFetch=True,
    )
    parsed = sm.StateResponseWithMapIterator()
    parsed.ParseFromString(resp.SerializeToString())
    assert [(p.key, p.value) for p in parsed.kvPair] == [(b"a", b"1"), (b"b", b"2")]
    assert parsed.requireNextFetch is True
    lst = sm.ListStatePut(value=[b"x", b"y", b"z"], fetchWithArrow=False)
    out = sm.ListStatePut()
    out.ParseFromString(lst.SerializeToString())
    assert list(out.value) == [b"x", b"y", b"z"]
    assert out.fetchWithArrow is False


def test_negative_int64_and_enum_roundtrip():
    t = sm.RegisterTimer(expiryTimestampMs=-123456789)
    out = sm.RegisterTimer()
    out.ParseFromString(t.SerializeToString())
    assert out.expiryTimestampMs == -123456789
    s = sm.SetHandleState(state=sm.CLOSED)
    out2 = sm.SetHandleState()
    out2.ParseFromString(s.SerializeToString())
    assert out2.state == sm.CLOSED == 5


def test_unknown_fields_are_skipped():
    # field 99 varint + field 98 length-delimited, then a known field
    raw = (
        _minipb.encode_tag(99, 0) + _minipb.encode_varint(7)
        + _minipb.encode_tag(98, 2) + _minipb.encode_varint(3) + b"abc"
        + _minipb.encode_tag(1, 0) + _minipb.encode_varint(42)
    )
    msg = sm.StateResponse()
    msg.ParseFromString(raw)
    assert msg.statusCode == 42


def test_nested_oneof_request_roundtrip_deep():
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            listStateCall=sm.ListStateCall(
                stateName="L",
                appendList=sm.AppendList(value=[b"p", b"q"], fetchWithArrow=False),
            )
        )
    )
    out = sm.StateRequest()
    out.ParseFromString(req.SerializeToString())
    assert out.WhichOneof("method") == "stateVariableRequest"
    call = out.stateVariableRequest.listStateCall
    assert call.stateName == "L" and list(call.appendList.value) == [b"p", b"q"]


def test_proto3_optional_timer_key():
    # TimerInfo.key is proto3_optional (synthetic oneof _key)
    t = sm.TimerInfo(timestampMs=9)
    assert not t.HasField("key")
    t2 = sm.TimerInfo(key=b"", timestampMs=9)
    assert t2.HasField("key")  # explicitly-set empty still present
    out = sm.TimerInfo()
    out.ParseFromString(t2.SerializeToString())
    assert out.HasField("key") and out.key == b"" and out.timestampMs == 9


def test_unsupported_shapes_raise_cleanly():
    with pytest.raises(ValueError):
        _minipb.decode_varint(b"\x80" * 11, 0)
    with pytest.raises((AttributeError, ValueError)):
        # shim raises AttributeError; the real runtime raises ValueError
        sm.StateResponse(nonexistent=1)


def test_descriptor_parser_reads_the_real_statemessage_file():
    """The FileDescriptorProto parser must recover the full message
    census of the real gencode's serialized descriptor."""
    fdesc = sm.DESCRIPTOR
    names = {m.name for m in fdesc.message_types}
    assert {"StateRequest", "StateResponse", "ValueStateCall",
            "ListStateCall", "MapStateCall", "TimerInfo",
            "StateCallCommand", "TTLConfig"} <= names
    assert fdesc.package == "org.apache.spark.sql.execution.streaming.state"
    enum = {e.name: dict(e.values) for e in fdesc.enum_types}
    assert enum["HandleState"]["PRE_INIT"] == 0
    assert enum["HandleState"]["CLOSED"] == 5
    # oneof bookkeeping: StateRequest's five method members share index 0
    sr = next(m for m in fdesc.message_types if m.name == "StateRequest")
    assert sr.oneofs == ["method"]
    oneof_members = [f.name for f in sr.fields if f.oneof_index == 0]
    assert "statefulProcessorCall" in oneof_members
    assert "version" not in oneof_members


def test_minipb_rejects_unsupported_descriptor_shapes():
    from aroa_etl_spark._vendor.google.protobuf._minipb import (
        FileDescriptor, encode_tag, encode_varint,
    )

    def fdp(message_bytes):
        # FileDescriptorProto: name(1), package(2), message_type(4)
        return (
            encode_tag(1, 2) + encode_varint(1) + b"f"
            + encode_tag(4, 2) + encode_varint(len(message_bytes))
            + message_bytes
        )

    # a message with a nested_type (field 3) must raise, not mis-parse
    nested = (
        encode_tag(1, 2) + encode_varint(1) + b"M"
        + encode_tag(3, 2) + encode_varint(3)
        + (encode_tag(1, 2) + encode_varint(1) + b"N")
    )
    with pytest.raises(NotImplementedError, match="nested"):
        FileDescriptor(fdp(nested))
    # a float field (type 2 = TYPE_FLOAT) must raise
    floaty = (
        encode_tag(1, 2) + encode_varint(1) + b"M"
        + encode_tag(2, 2) + encode_varint(len(
            encode_tag(1, 2) + encode_varint(1) + b"x"
            + encode_tag(3, 0) + encode_varint(1)
            + encode_tag(5, 0) + encode_varint(2)))
        + encode_tag(1, 2) + encode_varint(1) + b"x"
        + encode_tag(3, 0) + encode_varint(1)
        + encode_tag(5, 0) + encode_varint(2)
    )
    with pytest.raises(NotImplementedError, match="unsupported type"):
        FileDescriptor(fdp(floaty))


def test_packed_repeated_scalars_parse():
    """proto3's DEFAULT encoding for repeated scalars is packed (one
    length-delimited run of varints).  Dispatching on declared type
    before wire type misparsed packed [8, 8] as [2, 8] — the length
    varint landed as a value and the payload re-parsed as tag bytes."""
    from aroa_etl_spark._vendor.google.protobuf._minipb import (
        LABEL_REPEATED, TYPE_INT64, FieldDesc, MessageDesc, MiniMessage,
        encode_tag, encode_varint,
    )

    fd = FieldDesc("vals", 1, TYPE_INT64, LABEL_REPEATED, "", None, False)
    md = MessageDesc("Packed", "t.Packed", [fd], [])
    cls = type("Packed", (MiniMessage,), {"DESCRIPTOR": md})

    payload = encode_varint(8) + encode_varint(8)
    m = cls()
    m.ParseFromString(encode_tag(1, 2) + encode_varint(len(payload)) + payload)
    assert list(m.vals) == [8, 8]

    # unpacked (proto2-style) encoding of the same field still parses
    m2 = cls()
    m2.ParseFromString(
        encode_tag(1, 0) + encode_varint(3) + encode_tag(1, 0) + encode_varint(4)
    )
    assert list(m2.vals) == [3, 4]

    # negative int64 inside a packed run sign-extends like the unpacked path
    neg = encode_varint((1 << 64) - 1)
    m3 = cls()
    m3.ParseFromString(encode_tag(1, 2) + encode_varint(len(neg)) + neg)
    assert list(m3.vals) == [-1]

    # truncated packed payload raises, never silently truncates
    with pytest.raises(ValueError, match="packed"):
        cls().ParseFromString(encode_tag(1, 2) + encode_varint(10) + b"\x01")


def test_wrong_wire_type_on_singular_scalar_skips_as_unknown():
    """A length-delimited body arriving on a SINGULAR varint field
    contradicts the schema; real protobuf treats it as an unknown
    field.  StateResponse.statusCode (field 1) is singular int32."""
    raw = (
        _minipb.encode_tag(1, 2) + _minipb.encode_varint(2) + b"zz"
        + _minipb.encode_tag(2, 2) + _minipb.encode_varint(2) + b"ok"
    )
    msg = sm.StateResponse()
    msg.ParseFromString(raw)
    assert msg.statusCode == 0 and msg.errorMessage == "ok"

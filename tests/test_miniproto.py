"""Unit tests for the vendored clean-room mini protobuf runtime.

The integration gate is tests/test_stateful.py (the JVM parses every
byte the runtime emits over the transformWithState state protocol);
these tests pin the wire format directly — byte-level vectors from the
public protobuf encoding spec — so a regression is attributable without
driving a streaming query.
"""

from __future__ import annotations

import sys

import pytest

sys.path.append("/root/repo/clinvar_ingest_spark/vendor/miniproto")

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")

from google.protobuf import _mini  # noqa: E402


def test_known_wire_bytes_nested_oneof():
    # spec: tag = (field_number << 3) | wire_type; strings are
    # length-delimited. Field numbers from Spark's StateMessage.proto.
    cmd = sm.StateCallCommand(stateName="winner", schema="a int")
    call = sm.StatefulProcessorCall(getValueState=cmd)
    req = sm.StateRequest(version=2, statefulProcessorCall=call)
    assert req.SerializeToString() == bytes.fromhex(
        "0802"  # field 1 varint 2
        "1211"  # field 2 LEN 17 (StatefulProcessorCall)
        "120f"  # .field 2 LEN 15 (getValueState: StateCallCommand)
        "0a0677696e6e6572"  # ..field 1 "winner"
        "12056120696e74"  # ..field 2 "a int"
    )


def test_round_trip_all_shapes():
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"", b"bb"], requireNextFetch=True
    )
    p = sm.StateResponseWithListGet()
    p.ParseFromString(resp.SerializeToString())
    assert (p.statusCode, list(p.value), p.requireNextFetch) == (
        0, [b"a", b"", b"bb"], True,
    )
    # repeated message
    mi = sm.StateResponseWithMapIterator(
        statusCode=2,
        kvPair=[sm.KeyAndValuePair(key=b"k", value=b"v"),
                sm.KeyAndValuePair(key=b"k2")],
    )
    p = sm.StateResponseWithMapIterator()
    p.ParseFromString(mi.SerializeToString())
    assert [(x.key, x.value) for x in p.kvPair] == [(b"k", b"v"), (b"k2", b"")]
    # negative int64 must occupy 10 varint bytes (two's complement)
    r = sm.StateResponseWithLongTypeVal(value=-9)
    raw = r.SerializeToString()
    assert len(raw) == 11  # tag 0x18 + 10-byte two's-complement varint
    p = sm.StateResponseWithLongTypeVal()
    p.ParseFromString(raw)
    assert p.value == -9


def test_proto3_defaults_omitted_but_presence_kept():
    # no-presence scalar at default value serializes to nothing
    assert sm.StateResponse(statusCode=0).SerializeToString() == b""
    # explicitly-set empty sub-message keeps its presence byte(s):
    # Exists is field 2 of ValueStateCall
    v = sm.ValueStateCall(stateName="", exists=sm.Exists())
    assert v.SerializeToString() == bytes.fromhex("1200")
    # proto3 optional (TimerInfo.key) has real presence
    t = sm.TimerInfo(timestampMs=5)
    assert not t.HasField("key")
    t2 = sm.TimerInfo(key=b"", timestampMs=5)
    assert t2.HasField("key")
    rt = sm.TimerInfo()
    rt.ParseFromString(t2.SerializeToString())
    assert rt.HasField("key") and rt.key == b""


def test_oneof_last_writer_wins():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CLOSED)
        )
    )
    assert req.WhichOneof("method") == "statefulProcessorCall"
    req.implicitGroupingKeyRequest = sm.ImplicitGroupingKeyRequest(
        removeImplicitKey=sm.RemoveImplicitKey()
    )
    assert req.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert not req.HasField("statefulProcessorCall")


def test_unknown_fields_skipped():
    # bytes containing an unknown field (100, varint) around a known one
    buf = bytearray()
    _mini._enc_varint(buf, (100 << 3) | 0)
    _mini._enc_varint(buf, 7777)
    buf += sm.StateResponse(statusCode=3).SerializeToString()
    p = sm.StateResponse()
    p.ParseFromString(bytes(buf))
    assert p.statusCode == 3


def test_packed_repeated_scalar_parse():
    # the runtime emits non-packed, but must accept packed encodings:
    # synthesize a packed varint list for a repeated int field by
    # parsing into a descriptor we fabricate from the pool machinery
    pool = _mini.DescriptorPool()
    # FileDescriptorProto bytes for: message M { repeated int64 xs = 1; }
    # built with the runtime's own writer (self-consistent parse check)
    fd = bytearray()

    def ld(out, num, payload):
        _mini._enc_varint(out, (num << 3) | 2)
        _mini._enc_varint(out, len(payload))
        out += payload

    def vi(out, num, val):
        _mini._enc_varint(out, (num << 3) | 0)
        _mini._enc_varint(out, val)

    field = bytearray()
    ld(field, 1, b"xs")
    vi(field, 3, 1)   # number
    vi(field, 4, 3)   # label repeated
    vi(field, 5, 3)   # type int64
    msg = bytearray()
    ld(msg, 1, b"M")
    ld(msg, 2, bytes(field))
    ld(fd, 1, b"packedtest.proto")
    ld(fd, 4, bytes(msg))
    f = pool.AddSerializedFile(bytes(fd))
    M = f.message_types_by_name["M"]._concrete_class
    packed = bytearray()
    _mini._enc_varint(packed, (1 << 3) | 2)
    body = bytearray()
    for v in (1, 150, 3):
        _mini._enc_varint(body, v)
    _mini._enc_varint(packed, len(body))
    packed += body
    m = M()
    m.ParseFromString(bytes(packed))
    assert list(m.xs) == [1, 150, 3]


def test_enum_module_constants_and_wrapper():
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"
    assert sm.HandleState.Value("CREATED") == 1


def test_unknown_attribute_raises():
    with pytest.raises(AttributeError):
        sm.StateResponse(nope=1)
    with pytest.raises(AttributeError):
        sm.StateResponse().nope


def test_real_runtime_preferred_when_installed():
    """The vendor dir is APPENDED to sys.path / PYTHONPATH, so a real
    google.protobuf installation earlier on the path always wins."""
    from clinvar_ingest_spark.vendor import _MINIPROTO_DIR, ensure_protobuf

    assert ensure_protobuf() is True
    import google.protobuf as gp

    # in this sandbox only the vendored copy exists; the assertion that
    # matters everywhere: ensure_protobuf never PREPENDS over site-packages
    assert sys.path.index(_MINIPROTO_DIR) > 0
    assert gp.__version__.endswith("-mini") or "site-packages" in gp.__file__

"""Pure-Python proto3 scalar wire codec: parser, wire round-trips
(hypothesis property), unknown-field skip, and the Spark mapInPandas path."""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from arkflow_spark.codecs.proto_wire import (
    ProtoField,
    ProtoMessage,
    decode_record,
    encode_record,
    parse_proto,
)

PROTO = """
// sensor reading
syntax = "proto3";
package telemetry;

message Reading {
  int32 id = 1;          /* device id */
  sint64 delta = 2;
  uint32 seq = 3;
  double value = 4;
  float ratio = 5;
  bool ok = 6;
  string name = 7;
  bytes blob = 8;
  fixed64 ts = 9;
  sfixed32 offset = 10;
}
"""


def test_parse_proto_fields():
    msg = parse_proto(PROTO)
    assert msg.name == "Reading"
    assert [f.name for f in msg.fields] == [
        "id", "delta", "seq", "value", "ratio", "ok", "name", "blob", "ts", "offset",
    ]
    assert msg.spark_ddl().startswith("id int, delta long, seq long, value double")


@pytest.mark.parametrize(
    "snippet",
    [
        "message M { repeated int32 xs = 1; }",
        "message M { map<string, int32> m = 1; }",
        "message M { oneof k { int32 a = 1; } }",
        "message Outer { message Inner { int32 a = 1; } }",
    ],
)
def test_parse_proto_rejects_nonscalar(snippet):
    with pytest.raises(ValueError):
        parse_proto(snippet)


def test_roundtrip_simple():
    msg = parse_proto(PROTO)
    rec = {
        "id": -5, "delta": -(2**40), "seq": 2**31, "value": 2.5, "ratio": 0.5,
        "ok": True, "name": "héllo", "blob": b"\x00\x01", "ts": 2**40, "offset": -7,
    }
    out = decode_record(encode_record(rec, msg), msg)
    assert out == rec


def test_proto3_defaults_omitted_and_restored():
    msg = parse_proto(PROTO)
    defaults = {
        "id": 0, "delta": 0, "seq": 0, "value": 0.0, "ratio": 0.0,
        "ok": False, "name": "", "blob": b"", "ts": 0, "offset": 0,
    }
    assert encode_record(defaults, msg) == b""
    assert decode_record(b"", msg) == defaults


def test_unknown_fields_skipped():
    msg = ProtoMessage("M", (ProtoField(1, "a", "int32"),))
    # field 1 = 7 (varint), field 9 = "xx" (len), field 8 = fixed64
    data = (
        bytes([1 << 3, 7])
        + bytes([9 << 3 | 2, 2]) + b"xx"
        + bytes([8 << 3 | 1]) + struct.pack("<q", 42)
    )
    assert decode_record(data, msg) == {"a": 7}


def test_truncated_raises():
    msg = ProtoMessage("M", (ProtoField(1, "a", "string"),))
    good = encode_record({"a": "abcdef"}, msg)
    with pytest.raises(ValueError):
        decode_record(good[:-2], msg)


_FIELDS = ProtoMessage(
    "P",
    (
        ProtoField(1, "i32", "int32"),
        ProtoField(2, "i64", "int64"),
        ProtoField(3, "u32", "uint32"),
        ProtoField(4, "s32", "sint32"),
        ProtoField(5, "s64", "sint64"),
        ProtoField(6, "f64", "double"),
        ProtoField(7, "fx32", "fixed32"),
        ProtoField(8, "fx64", "fixed64"),
        ProtoField(9, "sf32", "sfixed32"),
        ProtoField(10, "sf64", "sfixed64"),
        ProtoField(11, "b", "bool"),
        ProtoField(12, "s", "string"),
        ProtoField(13, "by", "bytes"),
    ),
)


@settings(max_examples=200, deadline=None)
@given(
    i32=st.integers(-(2**31), 2**31 - 1),
    i64=st.integers(-(2**63), 2**63 - 1),
    u32=st.integers(0, 2**32 - 1),
    s32=st.integers(-(2**31), 2**31 - 1),
    s64=st.integers(-(2**63), 2**63 - 1),
    f64=st.floats(allow_nan=False),
    fx32=st.integers(0, 2**32 - 1),
    fx64=st.integers(-(2**63), 2**63 - 1),
    sf32=st.integers(-(2**31), 2**31 - 1),
    sf64=st.integers(-(2**63), 2**63 - 1),
    b=st.booleans(),
    s=st.text(max_size=50),
    by=st.binary(max_size=50),
)
def test_wire_roundtrip_property(**rec):
    out = decode_record(encode_record(rec, _FIELDS), _FIELDS)
    assert out == rec


def test_float_field_roundtrip_quantized():
    # float32 fields round-trip through their 32-bit representation
    msg = ProtoMessage("M", (ProtoField(1, "r", "float"),))
    v = 1.1
    out = decode_record(encode_record({"r": v}, msg), msg)
    assert math.isclose(out["r"], struct.unpack("<f", struct.pack("<f", v))[0])


# ----------------------------------------------------------------- spark path


def test_spark_decode_encode_roundtrip(spark):
    from arkflow_spark.registry import CODECS, load_all

    load_all()
    codec = CODECS.build({"type": "protobuf_wire", "proto": PROTO})
    msg = parse_proto(PROTO)
    rows = [
        {"id": 1, "delta": -3, "seq": 9, "value": 1.5, "ratio": 0.25, "ok": True,
         "name": "a", "blob": b"z", "ts": 100, "offset": -1},
        {"id": 2, "delta": 0, "seq": 0, "value": 0.0, "ratio": 0.0, "ok": False,
         "name": "", "blob": b"", "ts": 0, "offset": 0},
    ]
    payloads = [(bytearray(encode_record(r, msg)), "src") for r in rows]
    df = spark.createDataFrame(payloads, "__value__ binary, __meta_source string")

    decoded = codec.decode(spark, df)
    got = sorted([r.asDict() for r in decoded.collect()], key=lambda r: r["id"])
    assert got[0]["name"] == "a" and got[0]["__meta_source"] == "src"
    assert got[1] == {**rows[1], "blob": bytearray(b""), "__meta_source": "src"}

    reencoded = codec.encode(spark, decoded)
    assert set(reencoded.columns) == {"__value__", "__meta_source"}
    back = codec.decode(spark, reencoded)
    got2 = sorted([r.asDict() for r in back.collect()], key=lambda r: r["id"])
    assert got2 == got

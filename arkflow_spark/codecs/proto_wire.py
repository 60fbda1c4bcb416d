"""Pure-Python proto3 scalar wire-format codec (no jar, no protobuf lib).

Parity target: the reference's protobuf codec supports ONLY scalar proto3
fields — no nested/repeated/map/oneof (codec/protobuf.rs:144, limits
crates/arkflow-plugin/src/processor/protobuf.rs:19-25) — and parses message
definitions from ``.proto`` text. This module reimplements exactly that
surface from the public protobuf wire-format spec:

- varint (int32/int64/uint32/uint64/bool/enum), zigzag (sint32/sint64)
- fixed64/sfixed64/double (wire type 1), fixed32/sfixed32/float (wire 5)
- length-delimited string/bytes (wire 2)
- proto3 encoding drops default values; decode fills defaults back in
- unknown fields are skipped on decode (forward compatibility)

Spark integration lives in ``codecs.ProtoWireCodec``: Arrow-batched
``mapInPandas`` over the ``__value__`` binary column — the per-row Python
cost is confined to one vectorized stage, the same execution shape as the
reference's per-batch decode loop.
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass

_VARINT = {"int32", "int64", "uint32", "uint64", "bool", "enum", "sint32", "sint64"}
_FIXED64 = {"fixed64", "sfixed64", "double"}
_FIXED32 = {"fixed32", "sfixed32", "float"}
_LEN = {"string", "bytes"}
SCALAR_TYPES = _VARINT | _FIXED64 | _FIXED32 | _LEN

#: proto scalar type -> Spark SQL DDL type
SPARK_TYPE = {
    "double": "double",
    "float": "float",
    "int32": "int",
    "sint32": "int",
    "sfixed32": "int",
    "uint32": "long",
    "fixed32": "long",
    "int64": "long",
    "sint64": "long",
    "sfixed64": "long",
    "uint64": "long",  # >2^63-1 wraps negative, as in the reference's i64 map
    "fixed64": "long",
    "bool": "boolean",
    "enum": "int",
    "string": "string",
    "bytes": "binary",
}

_DEFAULTS = {"string": "", "bytes": b"", "bool": False, "double": 0.0, "float": 0.0}


@dataclass(frozen=True)
class ProtoField:
    number: int
    name: str
    ptype: str


@dataclass(frozen=True)
class ProtoMessage:
    name: str
    fields: tuple[ProtoField, ...]

    def spark_ddl(self) -> str:
        return ", ".join(f"{f.name} {SPARK_TYPE[f.ptype]}" for f in self.fields)


_FIELD_RE = re.compile(
    r"^\s*(optional\s+)?([A-Za-z0-9_.]+)\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(\d+)\s*;"
)
_UNSUPPORTED_RE = re.compile(r"^\s*(repeated|map\s*<|oneof\s|message\s|group\s)")


def parse_proto(text: str, message_name: str | None = None) -> ProtoMessage:
    """Parse scalar fields of one message from ``.proto`` source text.

    Mirrors the reference's descriptor-parse entry point
    (crates/arkflow-plugin/src/component/protobuf.rs) with its documented
    limits: nested messages, repeated, map and oneof raise ValueError.
    """
    # strip comments
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    msgs = re.findall(r"message\s+([A-Za-z_][A-Za-z0-9_]*)\s*\{([^{}]*)\}", text)
    nested = re.findall(r"message[^{}]*\{[^{}]*message", text)
    if nested:
        raise ValueError("nested messages unsupported (scalar proto3 only)")
    if not msgs:
        raise ValueError("no message definition found")
    by_name = dict(msgs)
    if message_name is None:
        message_name = msgs[0][0]
    if message_name not in by_name:
        raise ValueError(f"message '{message_name}' not found (have {sorted(by_name)})")
    body = by_name[message_name]
    fields: list[ProtoField] = []
    for line in body.split(";"):
        line = line.strip()
        if not line:
            continue
        if _UNSUPPORTED_RE.match(line):
            raise ValueError(
                f"unsupported field (scalar proto3 only, as in the reference): {line!r}"
            )
        m = _FIELD_RE.match(line + ";")
        if not m:
            continue
        _, ptype, name, num = m.groups()
        if ptype not in SCALAR_TYPES:
            raise ValueError(f"non-scalar field type {ptype!r} unsupported")
        fields.append(ProtoField(int(num), name, ptype))
    if not fields:
        raise ValueError(f"message '{message_name}' has no scalar fields")
    return ProtoMessage(message_name, tuple(fields))


# ------------------------------------------------------------------ encoding


def _write_varint(out: bytearray, v: int) -> None:
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def encode_record(values: dict, msg: ProtoMessage) -> bytes:
    """proto3 encode: fields in number order, defaults omitted."""
    out = bytearray()
    for f in sorted(msg.fields, key=lambda f: f.number):
        v = values.get(f.name)
        default = _DEFAULTS.get(f.ptype, 0)
        if v is None or v == default:
            continue
        if f.ptype in _VARINT:
            _write_varint(out, f.number << 3 | 0)
            iv = int(v)
            if f.ptype in ("sint32", "sint64"):
                iv = _zigzag(iv)
            _write_varint(out, iv)
        elif f.ptype in _FIXED64:
            _write_varint(out, f.number << 3 | 1)
            out += struct.pack(
                "<d" if f.ptype == "double" else "<q", v if f.ptype == "double" else int(v)
            )
        elif f.ptype in _FIXED32:
            _write_varint(out, f.number << 3 | 5)
            out += struct.pack(
                "<f" if f.ptype == "float" else "<i" if f.ptype == "sfixed32" else "<I",
                v if f.ptype == "float" else int(v),
            )
        else:  # string / bytes
            data = v.encode("utf-8") if f.ptype == "string" else bytes(v)
            _write_varint(out, f.number << 3 | 2)
            _write_varint(out, len(data))
            out += data
    return bytes(out)


# ------------------------------------------------------------------ decoding


def _read_varint(data: bytes, i: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        if i >= len(data):
            raise ValueError("truncated varint")
        b = data[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _to_signed32(v: int) -> int:
    v &= (1 << 32) - 1
    return v - (1 << 32) if v >= (1 << 31) else v


def decode_record(data: bytes, msg: ProtoMessage) -> dict:
    """Decode one record; unknown fields skipped, absent fields defaulted."""
    by_num = {f.number: f for f in msg.fields}
    out: dict = {}
    i = 0
    while i < len(data):
        key, i = _read_varint(data, i)
        num, wire = key >> 3, key & 7
        f = by_num.get(num)
        if wire == 0:
            raw, i = _read_varint(data, i)
            if f is not None and f.ptype in _VARINT:
                if f.ptype == "bool":
                    out[f.name] = bool(raw)
                elif f.ptype in ("sint32", "sint64"):
                    out[f.name] = _unzigzag(raw)
                elif f.ptype == "int32":
                    out[f.name] = _to_signed32(raw)
                elif f.ptype == "int64":
                    out[f.name] = _to_signed64(raw)
                elif f.ptype == "uint32":
                    out[f.name] = raw & ((1 << 32) - 1)
                elif f.ptype == "uint64":
                    out[f.name] = _to_signed64(raw)  # fits Spark long
                else:  # enum
                    out[f.name] = _to_signed32(raw)
        elif wire == 1:
            if i + 8 > len(data):
                raise ValueError("truncated fixed64")
            chunk, i = data[i : i + 8], i + 8
            if f is not None and f.ptype in _FIXED64:
                out[f.name] = (
                    struct.unpack("<d", chunk)[0]
                    if f.ptype == "double"
                    else struct.unpack("<q", chunk)[0]
                )
        elif wire == 5:
            if i + 4 > len(data):
                raise ValueError("truncated fixed32")
            chunk, i = data[i : i + 4], i + 4
            if f is not None and f.ptype in _FIXED32:
                out[f.name] = (
                    struct.unpack("<f", chunk)[0]
                    if f.ptype == "float"
                    else struct.unpack("<i", chunk)[0]
                    if f.ptype == "sfixed32"
                    else struct.unpack("<I", chunk)[0]
                )
        elif wire == 2:
            ln, i = _read_varint(data, i)
            if i + ln > len(data):
                raise ValueError("truncated length-delimited field")
            chunk, i = data[i : i + ln], i + ln
            if f is not None and f.ptype in _LEN:
                out[f.name] = chunk.decode("utf-8") if f.ptype == "string" else chunk
        else:
            raise ValueError(f"unsupported wire type {wire}")
    # proto3 defaults for absent fields
    for f in msg.fields:
        if f.name not in out:
            out[f.name] = _DEFAULTS.get(f.ptype, 0)
    return out

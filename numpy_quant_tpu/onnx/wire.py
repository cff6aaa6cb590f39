"""Protobuf wire-format codec (self-contained, no protobuf dependency).

The environment this framework targets does not ship the ``onnx`` or
``protobuf`` Python packages, so we implement the small slice of the
protobuf wire format that ONNX files use: varints, 32/64-bit scalars and
length-delimited fields, with packed and unpacked repeated numerics.

Schema-driven: each message class declares a ``FIELDS`` table mapping
field numbers to (name, kind, [message type]).  See proto.py.
"""
from __future__ import annotations

import struct
from typing import Any

# Wire types
WT_VARINT = 0
WT_I64 = 1
WT_LEN = 2
WT_I32 = 5


# ---------------------------------------------------------------------------
# Encoding
# ---------------------------------------------------------------------------

def encode_varint(value: int) -> bytes:
    """Unsigned LEB128. Negative ints are encoded as 64-bit two's complement."""
    if value < 0:
        value &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_tag(field_num: int, wire_type: int) -> bytes:
    return encode_varint((field_num << 3) | wire_type)


def encode_len_field(field_num: int, payload: bytes) -> bytes:
    return encode_tag(field_num, WT_LEN) + encode_varint(len(payload)) + payload


def encode_varint_field(field_num: int, value: int) -> bytes:
    return encode_tag(field_num, WT_VARINT) + encode_varint(value)


def encode_float_field(field_num: int, value: float) -> bytes:
    return encode_tag(field_num, WT_I32) + struct.pack("<f", value)


def encode_double_field(field_num: int, value: float) -> bytes:
    return encode_tag(field_num, WT_I64) + struct.pack("<d", value)


def encode_packed_varints(field_num: int, values) -> bytes:
    payload = b"".join(encode_varint(v) for v in values)
    return encode_len_field(field_num, payload)


def encode_packed_floats(field_num: int, values) -> bytes:
    payload = struct.pack(f"<{len(values)}f", *values)
    return encode_len_field(field_num, payload)


def encode_packed_doubles(field_num: int, values) -> bytes:
    payload = struct.pack(f"<{len(values)}d", *values)
    return encode_len_field(field_num, payload)


# ---------------------------------------------------------------------------
# Decoding
# ---------------------------------------------------------------------------

def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def to_signed64(value: int) -> int:
    """Interpret an unsigned varint as a two's-complement int64."""
    if value >= 1 << 63:
        value -= 1 << 64
    return value


def decode_tag(buf: bytes, pos: int) -> tuple[int, int, int]:
    tag, pos = decode_varint(buf, pos)
    return tag >> 3, tag & 0x7, pos


def skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == WT_VARINT:
        _, pos = decode_varint(buf, pos)
    elif wire_type == WT_I64:
        pos += 8
    elif wire_type == WT_LEN:
        n, pos = decode_varint(buf, pos)
        pos += n
    elif wire_type == WT_I32:
        pos += 4
    else:
        raise ValueError(f"cannot skip wire type {wire_type}")
    return pos


def decode_packed_varints(payload: bytes, signed: bool = True) -> list[int]:
    pos = 0
    out = []
    n = len(payload)
    while pos < n:
        v, pos = decode_varint(payload, pos)
        out.append(to_signed64(v) if signed else v)
    return out


def decode_packed_floats(payload: bytes) -> list[float]:
    return list(struct.unpack(f"<{len(payload) // 4}f", payload))


def decode_packed_doubles(payload: bytes) -> list[float]:
    return list(struct.unpack(f"<{len(payload) // 8}d", payload))


# ---------------------------------------------------------------------------
# Schema-driven message serialization
# ---------------------------------------------------------------------------
# Field kinds:
#   'int'      varint scalar (signed int64 semantics)
#   'uint'     varint scalar (unsigned)
#   'float'    32-bit float scalar
#   'double'   64-bit float scalar
#   'string'   utf-8 string
#   'bytes'    raw bytes
#   'message'  nested message (class given alongside)
#   'ints'     repeated varint (packed on write; both forms on read)
#   'uints'    repeated unsigned varint
#   'floats'   repeated float (packed)
#   'doubles'  repeated double (packed)
#   'strings'  repeated string
#   'messages' repeated nested message

_SCALAR_DEFAULTS = {
    "int": 0,
    "uint": 0,
    "float": 0.0,
    "double": 0.0,
    "string": "",
    "bytes": b"",
}


def message_default(kind: str):
    if kind in _SCALAR_DEFAULTS:
        return _SCALAR_DEFAULTS[kind]
    if kind == "message":
        return None
    return []  # repeated kinds


def serialize_message(msg: Any) -> bytes:
    out = bytearray()
    for num, (name, kind, *rest) in type(msg).FIELDS.items():
        val = getattr(msg, name)
        if kind == "int" or kind == "uint":
            if val:
                out += encode_varint_field(num, int(val))
        elif kind == "float":
            if val:
                out += encode_float_field(num, float(val))
        elif kind == "double":
            if val:
                out += encode_double_field(num, float(val))
        elif kind == "string":
            if val:
                out += encode_len_field(num, val.encode("utf-8"))
        elif kind == "bytes":
            if val:
                out += encode_len_field(num, bytes(val))
        elif kind == "message":
            if val is not None:
                out += encode_len_field(num, serialize_message(val))
        elif kind in ("ints", "uints"):
            if len(val):
                out += encode_packed_varints(num, [int(v) for v in val])
        elif kind == "floats":
            if len(val):
                out += encode_packed_floats(num, [float(v) for v in val])
        elif kind == "doubles":
            if len(val):
                out += encode_packed_doubles(num, [float(v) for v in val])
        elif kind == "strings":
            for s in val:
                if isinstance(s, str):
                    s = s.encode("utf-8")
                out += encode_len_field(num, s)
        elif kind == "messages":
            for m in val:
                out += encode_len_field(num, serialize_message(m))
        else:
            raise ValueError(f"unknown field kind {kind}")
    return bytes(out)


def parse_message(cls, buf: bytes, start: int = 0, end: int | None = None):
    msg = cls()
    pos = start
    if end is None:
        end = len(buf)
    fields = cls.FIELDS
    while pos < end:
        num, wt, pos = decode_tag(buf, pos)
        spec = fields.get(num)
        if spec is None:
            pos = skip_field(buf, pos, wt)
            continue
        name, kind, *rest = spec
        if kind in ("int", "uint"):
            v, pos = decode_varint(buf, pos)
            setattr(msg, name, to_signed64(v) if kind == "int" else v)
        elif kind == "float":
            setattr(msg, name, struct.unpack_from("<f", buf, pos)[0])
            pos += 4
        elif kind == "double":
            setattr(msg, name, struct.unpack_from("<d", buf, pos)[0])
            pos += 8
        elif kind == "string":
            n, pos = decode_varint(buf, pos)
            setattr(msg, name, buf[pos:pos + n].decode("utf-8"))
            pos += n
        elif kind == "bytes":
            n, pos = decode_varint(buf, pos)
            setattr(msg, name, bytes(buf[pos:pos + n]))
            pos += n
        elif kind == "message":
            n, pos = decode_varint(buf, pos)
            setattr(msg, name, parse_message(rest[0], buf, pos, pos + n))
            pos += n
        elif kind in ("ints", "uints"):
            signed = kind == "ints"
            if wt == WT_LEN:
                n, pos = decode_varint(buf, pos)
                getattr(msg, name).extend(
                    decode_packed_varints(buf[pos:pos + n], signed=signed))
                pos += n
            else:
                v, pos = decode_varint(buf, pos)
                getattr(msg, name).append(to_signed64(v) if signed else v)
        elif kind == "floats":
            if wt == WT_LEN:
                n, pos = decode_varint(buf, pos)
                getattr(msg, name).extend(decode_packed_floats(buf[pos:pos + n]))
                pos += n
            else:
                getattr(msg, name).append(struct.unpack_from("<f", buf, pos)[0])
                pos += 4
        elif kind == "doubles":
            if wt == WT_LEN:
                n, pos = decode_varint(buf, pos)
                getattr(msg, name).extend(decode_packed_doubles(buf[pos:pos + n]))
                pos += n
            else:
                getattr(msg, name).append(struct.unpack_from("<d", buf, pos)[0])
                pos += 8
        elif kind == "strings":
            n, pos = decode_varint(buf, pos)
            getattr(msg, name).append(buf[pos:pos + n].decode("utf-8"))
            pos += n
        elif kind == "messages":
            n, pos = decode_varint(buf, pos)
            getattr(msg, name).append(parse_message(rest[0], buf, pos, pos + n))
            pos += n
        else:
            raise ValueError(f"unknown field kind {kind}")
    return msg

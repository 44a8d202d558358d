"""Pure-Python protobuf wire-format codec (T4/T5/T7 executable path).

The reference's *default* middleware deserializes protobuf byte
payloads into maps (src/ziggurat/middleware/default.clj:36-85) and
recursively flattens ``google.protobuf.Struct`` fields into plain
maps/lists/scalars/nil (default.clj:9-34). Its batch variant decodes
both key and value (batch/batch_proto_deserializer.clj:4-21). The
idiomatic Spark spelling is ``from_protobuf`` — implemented in
``middleware.protobuf_value`` — but this environment ships no
spark-protobuf jar, no protoc, and no python google.protobuf, so that
path cannot execute. Rather than leave the reference's default
middleware untested, this module implements the protobuf **wire
format** itself from the public encoding spec
(https://protobuf.dev/programming-guides/encoding/):

    message   := (tag value)*
    tag       := varint(field_number << 3 | wire_type)
    wire 0    := varint        (int32/64, uint, bool, enum; sint = zigzag)
    wire 1    := 64-bit LE     (double, fixed64, sfixed64)
    wire 2    := len-delimited (string, bytes, sub-message, packed)
    wire 5    := 32-bit LE     (float, fixed32, sfixed32)

plus the well-known ``Struct``/``Value``/``ListValue`` messages
(public struct.proto: Struct{map<string,Value> fields=1},
Value{oneof: null_value=1, number_value=2, string_value=3,
bool_value=4, struct_value=5, list_value=6},
ListValue{repeated Value values=1}).

Everything here is driver/executor-side plain Python over ``bytes``;
the Spark integration (middleware.protobuf_value_py) runs decode as an
Arrow-batched Pandas UDF producing a canonical-JSON string (bytes →
base64, like protobuf's JSON mapping) that ``from_json`` types
JVM-side — parse failure is a NULL payload, the nil contract.
"""

from __future__ import annotations

import base64
import json
import struct as _struct
from dataclasses import dataclass, field as dc_field

_SCALAR_DEFAULTS = {
    "int32": 0, "int64": 0, "uint32": 0, "uint64": 0,
    "sint32": 0, "sint64": 0, "fixed32": 0, "fixed64": 0,
    "sfixed32": 0, "sfixed64": 0, "bool": False,
    "double": 0.0, "float": 0.0, "string": "", "bytes": b"",
}

_WIRE_BY_TYPE = {
    "int32": 0, "int64": 0, "uint32": 0, "uint64": 0, "sint32": 0,
    "sint64": 0, "bool": 0, "enum": 0,
    "double": 1, "fixed64": 1, "sfixed64": 1,
    "string": 2, "bytes": 2, "message": 2, "struct": 2,
    "float": 5, "fixed32": 5, "sfixed32": 5,
}


@dataclass(frozen=True)
class Field:
    """One field of a message descriptor."""

    number: int
    name: str
    type: str  # a key of _WIRE_BY_TYPE
    repeated: bool = False
    message: "Descriptor | None" = None  # for type == "message"


@dataclass(frozen=True)
class Descriptor:
    """A message type: the minimal stand-in for a compiled descriptor."""

    name: str
    fields: tuple[Field, ...] = ()

    def by_number(self) -> dict[int, Field]:
        return {f.number: f for f in self.fields}


# -- varint / zigzag ----------------------------------------------------------

def _write_varint(out: bytearray, value: int) -> None:
    if value < 0:
        # negative int32/int64 encode as 10-byte two's-complement varint
        value += 1 << 64
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _unpack(fmt: str, data: bytes, pos: int, size: int):
    if pos + size > len(data):
        raise ValueError("truncated fixed-width field")
    return _struct.unpack_from(fmt, data, pos)[0]


def _to_signed(value: int, bits: int) -> int:
    if value >= 1 << (bits - 1):
        value -= 1 << bits
    return value


# -- encode -------------------------------------------------------------------

def encode(msg: dict, desc: Descriptor) -> bytes:
    """Encode a plain dict per ``desc``. Proto3 semantics: scalar
    fields equal to their default are omitted from the wire; None is
    always omitted; repeated scalars are packed (wire 2)."""
    out = bytearray()
    for f in desc.fields:
        v = msg.get(f.name)
        if v is None:
            continue
        if f.repeated:
            if not v:
                continue
            wire = _WIRE_BY_TYPE[f.type]
            if wire in (0, 1, 5) and f.type != "struct":
                # packed repeated scalars
                packed = bytearray()
                for item in v:
                    _encode_scalar(packed, f, item)
                _write_varint(out, f.number << 3 | 2)
                _write_varint(out, len(packed))
                out += packed
            else:
                for item in v:
                    _encode_one(out, f, item)
        else:
            if f.type in _SCALAR_DEFAULTS and v == _SCALAR_DEFAULTS[f.type]:
                continue
            _encode_one(out, f, v)
    return bytes(out)


def _encode_one(out: bytearray, f: Field, v) -> None:
    wire = _WIRE_BY_TYPE[f.type]
    _write_varint(out, f.number << 3 | wire)
    if wire == 2:
        if f.type == "string":
            payload = v.encode("utf-8")
        elif f.type == "bytes":
            payload = bytes(v)
        elif f.type == "struct":
            payload = encode_struct(v)
        else:  # message
            payload = encode(v, f.message)
        _write_varint(out, len(payload))
        out += payload
    else:
        _encode_scalar(out, f, v)


def _encode_scalar(out: bytearray, f: Field, v) -> None:
    t = f.type
    if t in ("int32", "int64", "uint32", "uint64", "enum"):
        _write_varint(out, int(v))
    elif t in ("sint32", "sint64"):
        _write_varint(out, _zigzag(int(v)))
    elif t == "bool":
        _write_varint(out, 1 if v else 0)
    elif t == "double":
        out += _struct.pack("<d", float(v))
    elif t == "float":
        out += _struct.pack("<f", float(v))
    elif t in ("fixed64", "sfixed64"):
        out += _struct.pack("<q" if t == "sfixed64" else "<Q", int(v))
    elif t in ("fixed32", "sfixed32"):
        out += _struct.pack("<i" if t == "sfixed32" else "<I", int(v))
    else:  # pragma: no cover
        raise TypeError(f"not a scalar type: {t}")


# -- decode -------------------------------------------------------------------

def decode(data: bytes, desc: Descriptor) -> dict:
    """Decode wire bytes into a plain dict. Proto3 semantics: missing
    scalars get their type default, missing sub-messages get None,
    missing repeated fields get []; unknown field numbers are skipped;
    later occurrences of a singular field win (last-one-wins)."""
    by_num = desc.by_number()
    out: dict = {}
    for f in desc.fields:
        if f.repeated:
            out[f.name] = []
        elif f.type in ("message", "struct"):
            out[f.name] = None
        else:
            out[f.name] = _SCALAR_DEFAULTS[f.type]
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        num, wire = tag >> 3, tag & 7
        f = by_num.get(num)
        if f is None:
            pos = _skip(data, pos, wire)
            continue
        if f.repeated and wire == 2 and _WIRE_BY_TYPE[f.type] in (0, 1, 5):
            # packed repeated scalars (packed encoding is only legal
            # for repeated fields; a singular scalar arriving with
            # wire 2 falls through to the mismatch ValueError below)
            ln, pos = _read_varint(data, pos)
            end = pos + ln
            if end > len(data):
                raise ValueError("truncated packed field")
            vals = []
            while pos < end:
                v, pos = _decode_scalar(data, pos, f.type)
                vals.append(v)
            out[f.name].extend(vals)
            continue
        if wire != _WIRE_BY_TYPE[f.type]:
            raise ValueError(
                f"wire type {wire} does not match field {f.name} ({f.type})"
            )
        if wire == 2:
            ln, pos = _read_varint(data, pos)
            end = pos + ln
            if end > len(data):
                raise ValueError("truncated length-delimited field")
            raw = data[pos:end]
            pos = end
            if f.type == "string":
                v = raw.decode("utf-8")
            elif f.type == "bytes":
                v = raw
            elif f.type == "struct":
                v = decode_struct(raw)
            else:
                v = decode(raw, f.message)
        else:
            v, pos = _decode_scalar(data, pos, f.type)
        if f.repeated:
            out[f.name].append(v)
        else:
            out[f.name] = v
    return out


def _decode_scalar(data: bytes, pos: int, t: str) -> tuple[object, int]:
    if t in ("int32", "int64"):
        # negatives arrive sign-extended as 64-bit two's-complement varints
        v, pos = _read_varint(data, pos)
        return _to_signed(v, 64), pos
    if t in ("uint32", "uint64", "enum"):
        v, pos = _read_varint(data, pos)
        return v, pos
    if t in ("sint32", "sint64"):
        v, pos = _read_varint(data, pos)
        return _unzigzag(v), pos
    if t == "bool":
        v, pos = _read_varint(data, pos)
        return bool(v), pos
    if t == "double":
        return _unpack("<d", data, pos, 8), pos + 8
    if t == "float":
        return _unpack("<f", data, pos, 4), pos + 4
    if t == "fixed64":
        return _unpack("<Q", data, pos, 8), pos + 8
    if t == "sfixed64":
        return _unpack("<q", data, pos, 8), pos + 8
    if t == "fixed32":
        return _unpack("<I", data, pos, 4), pos + 4
    if t == "sfixed32":
        return _unpack("<i", data, pos, 4), pos + 4
    raise TypeError(f"not a scalar type: {t}")  # pragma: no cover


def _skip(data: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(data, pos)
        return pos
    if wire == 1:
        end = pos + 8
    elif wire == 2:
        ln, pos = _read_varint(data, pos)
        end = pos + ln
    elif wire == 5:
        end = pos + 4
    else:
        raise ValueError(f"cannot skip unknown wire type {wire}")
    if end > len(data):
        raise ValueError("truncated skipped field")
    return end


# -- google.protobuf.Struct (well-known type) --------------------------------

def encode_struct(obj: dict) -> bytes:
    """Python dict → Struct wire bytes (struct.proto semantics)."""
    out = bytearray()
    for k, v in obj.items():
        entry = bytearray()
        kb = str(k).encode("utf-8")
        _write_varint(entry, 1 << 3 | 2)
        _write_varint(entry, len(kb))
        entry += kb
        vb = _encode_value(v)
        _write_varint(entry, 2 << 3 | 2)
        _write_varint(entry, len(vb))
        entry += vb
        _write_varint(out, 1 << 3 | 2)  # Struct.fields map entry
        _write_varint(out, len(entry))
        out += entry
    return bytes(out)


def _encode_value(v) -> bytes:
    out = bytearray()
    if v is None:
        _write_varint(out, 1 << 3 | 0)  # null_value = NULL_VALUE(0)
        _write_varint(out, 0)
    elif isinstance(v, bool):
        _write_varint(out, 4 << 3 | 0)
        _write_varint(out, 1 if v else 0)
    elif isinstance(v, (int, float)):
        _write_varint(out, 2 << 3 | 1)
        out += _struct.pack("<d", float(v))
    elif isinstance(v, str):
        b = v.encode("utf-8")
        _write_varint(out, 3 << 3 | 2)
        _write_varint(out, len(b))
        out += b
    elif isinstance(v, dict):
        b = encode_struct(v)
        _write_varint(out, 5 << 3 | 2)
        _write_varint(out, len(b))
        out += b
    elif isinstance(v, (list, tuple)):
        lv = bytearray()
        for item in v:
            ib = _encode_value(item)
            _write_varint(lv, 1 << 3 | 2)  # ListValue.values
            _write_varint(lv, len(ib))
            lv += ib
        _write_varint(out, 6 << 3 | 2)
        _write_varint(out, len(lv))
        out += lv
    else:
        raise TypeError(f"unsupported Struct value: {type(v)}")
    return bytes(out)


def _checked_slice(data: bytes, pos: int, ln: int) -> bytes:
    """Bounds-checked length-delimited slice: a declared length that
    overruns the buffer is CORRUPTION, not padding — a silent
    Python-slice truncation would decode partial/garbage data as a
    'good' message and bypass the NULL-payload poison contract
    (top-level ``decode`` already raises on this; the Struct path
    must too)."""
    if pos + ln > len(data):
        raise ValueError("truncated length-delimited field")
    return data[pos:pos + ln]


def decode_struct(data: bytes) -> dict:
    """Struct wire bytes → plain Python dict — the executable
    equivalent of the reference's recursive flatten
    (middleware/default.clj:9-34): null_value → None, struct_value →
    dict, list_value → list, scalars pass through."""
    out: dict = {}
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        if tag >> 3 != 1 or tag & 7 != 2:
            pos = _skip(data, pos, tag & 7)
            continue
        ln, pos = _read_varint(data, pos)
        entry = _checked_slice(data, pos, ln)
        pos += ln
        key, value = None, None
        ep = 0
        while ep < len(entry):
            etag, ep = _read_varint(entry, ep)
            eln, ep = _read_varint(entry, ep)
            raw = _checked_slice(entry, ep, eln)
            ep += eln
            if etag >> 3 == 1:
                key = raw.decode("utf-8")
            elif etag >> 3 == 2:
                value = _decode_value(raw)
        if key is not None:
            out[key] = value
    return out


def _decode_value(data: bytes):
    pos = 0
    result = None
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        num, wire = tag >> 3, tag & 7
        if num == 1 and wire == 0:  # null_value
            _, pos = _read_varint(data, pos)
            result = None
        elif num == 2 and wire == 1:  # number_value
            result = _unpack("<d", data, pos, 8)
            pos += 8
        elif num == 3 and wire == 2:  # string_value
            ln, pos = _read_varint(data, pos)
            result = _checked_slice(data, pos, ln).decode("utf-8")
            pos += ln
        elif num == 4 and wire == 0:  # bool_value
            v, pos = _read_varint(data, pos)
            result = bool(v)
        elif num == 5 and wire == 2:  # struct_value
            ln, pos = _read_varint(data, pos)
            result = decode_struct(_checked_slice(data, pos, ln))
            pos += ln
        elif num == 6 and wire == 2:  # list_value
            ln, pos = _read_varint(data, pos)
            sub, result, sp = _checked_slice(data, pos, ln), [], 0
            pos += ln
            while sp < len(sub):
                stag, sp = _read_varint(sub, sp)
                sln, sp = _read_varint(sub, sp)
                if stag >> 3 == 1:
                    result.append(_decode_value(_checked_slice(sub, sp, sln)))
                sp += sln
        else:
            pos = _skip(data, pos, wire)
    return result


# -- JSON bridge (decode UDF → from_json) ------------------------------------

def to_canonical_json(msg: dict, desc: Descriptor) -> str:
    """Decoded dict → JSON string for JVM-side ``from_json`` typing.
    Follows protobuf's canonical JSON mapping for bytes (base64);
    int64 stays numeric (both sides of the bridge are ours)."""
    return json.dumps(_jsonable(msg, desc), sort_keys=True)


def _jsonable(msg: dict, desc: Descriptor):
    out = {}
    for f in desc.fields:
        v = msg.get(f.name)
        if f.repeated:
            out[f.name] = [_jsonable_one(f, item) for item in (v or [])]
        else:
            out[f.name] = _jsonable_one(f, v)
    return out


def _jsonable_one(f: Field, v):
    if v is None:
        return None
    if f.type == "bytes":
        return base64.b64encode(v).decode("ascii")
    if f.type == "message":
        return _jsonable(v, f.message)
    if f.type == "struct":
        return v  # already plain json-able python
    return v

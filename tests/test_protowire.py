"""Wire-format codec tests (T4/T5/T7 executable path).

Golden vectors come from the public protobuf encoding spec
(protobuf.dev/programming-guides/encoding): the `08 96 01` int32=150
example, the `12 07 "testing"` string example, 10-byte negative
varints, zigzag sint, packed repeated scalars. Struct semantics match
the reference's recursive flatten (middleware/default.clj:9-34):
null→None, struct→map, list→vector, scalars pass through.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ziggurat_spark.functions.protowire import (
    Descriptor,
    Field,
    decode,
    decode_struct,
    encode,
    encode_struct,
    to_canonical_json,
)

T_INT = Descriptor("T", (Field(1, "a", "int32"),))
T_STR = Descriptor("T", (Field(2, "b", "string"),))
TAG = Descriptor("Tag", (Field(1, "person_id", "int32"), Field(3, "y", "int32")))
PHOTO = Descriptor(
    "Photo",
    (
        Field(1, "id", "int32"),
        Field(2, "path", "string"),
        Field(6, "image", "bytes"),
        Field(7, "tags", "message", repeated=True, message=TAG),
        Field(8, "scores", "double", repeated=True),
        Field(9, "ok", "bool"),
    ),
)


def test_spec_golden_int32():
    assert encode({"a": 150}, T_INT) == bytes.fromhex("089601")
    assert decode(bytes.fromhex("089601"), T_INT)["a"] == 150


def test_spec_golden_string():
    assert encode({"b": "testing"}, T_STR) == bytes.fromhex(
        "120774657374696e67"
    )


def test_negative_int32_sign_extends_to_ten_bytes():
    b = encode({"a": -2}, T_INT)
    assert len(b) == 11  # 1 tag byte + 10 varint bytes
    assert decode(b, T_INT)["a"] == -2


def test_zigzag_sint():
    d = Descriptor("T", (Field(1, "a", "sint64"),))
    for v in (0, -1, 1, -123456, 2**40, -(2**40)):
        assert decode(encode({"a": v}, d), d)["a"] == v


def test_proto3_default_omitted_from_wire():
    assert encode({"a": 0}, T_INT) == b""
    assert decode(b"", T_INT) == {"a": 0}  # default materialized


def test_nested_repeated_packed_bytes_roundtrip():
    m = {
        "id": 7,
        "path": "a/b",
        "image": b"\x00\xff\x10",
        "tags": [{"person_id": 1, "y": 2}, {"person_id": -3, "y": 0}],
        "scores": [1.5, -2.25, 0.0],
        "ok": True,
    }
    assert decode(encode(m, PHOTO), PHOTO) == m


def test_unknown_fields_skipped():
    m = {"id": 7, "path": "x", "image": b"z", "tags": [], "scores": [], "ok": False}
    narrow = Descriptor("P", (Field(2, "path", "string"),))
    assert decode(encode(m, PHOTO), narrow) == {"path": "x"}


def test_truncated_raises():
    full = encode({"b": "testing"}, T_STR)
    with pytest.raises(ValueError):
        decode(full[:-1], T_STR)


def test_last_one_wins_singular():
    two = encode({"a": 1}, T_INT) + encode({"a": 99}, T_INT)
    assert decode(two, T_INT)["a"] == 99


def test_struct_flatten_parity():
    # default.clj:9-34: null→nil, struct→map, list→vector, scalar as-is
    s = {
        "a": None,
        "b": 2.5,
        "c": "x",
        "d": True,
        "e": {"f": [1.0, "y", None, {"g": False}], "h": {}},
    }
    assert decode_struct(encode_struct(s)) == s


def test_canonical_json_bytes_base64():
    import base64, json

    m = {"id": 1, "path": "p", "image": b"\x01\x02", "tags": [], "scores": [], "ok": False}
    j = json.loads(to_canonical_json(m, PHOTO))
    assert j["image"] == base64.b64encode(b"\x01\x02").decode()


_struct_value = st.recursive(
    st.none()
    | st.booleans()
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=8),
    lambda children: st.lists(children, max_size=3)
    | st.dictionaries(st.text(max_size=5), children, max_size=3),
    max_leaves=12,
)


@settings(max_examples=60, deadline=None)
@given(st.dictionaries(st.text(min_size=1, max_size=6), _struct_value, max_size=4))
def test_struct_roundtrip_property(obj):
    assert decode_struct(encode_struct(obj)) == obj


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.text(max_size=20),
    st.binary(max_size=30),
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=64), max_size=5
    ),
    st.booleans(),
)
def test_message_roundtrip_property(i, s, b, scores, ok):
    m = {"id": i, "path": s, "image": b, "tags": [], "scores": scores, "ok": ok}
    assert decode(encode(m, PHOTO), PHOTO) == m


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=64))
def test_decode_arbitrary_bytes_never_hangs_or_crashes(data):
    """Poison-payload contract: decoding arbitrary bytes either
    returns a dict or raises a clean ValueError/UnicodeDecodeError —
    never an unbounded loop or another exception type (the middleware
    maps those to NULL payloads, R4)."""
    try:
        out = decode(data, PHOTO)
        assert isinstance(out, dict)
    except (ValueError, UnicodeDecodeError):
        pass


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=64))
def test_decode_struct_arbitrary_bytes(data):
    try:
        out = decode_struct(data)
        assert isinstance(out, dict)
    except (ValueError, UnicodeDecodeError):
        pass


def test_singular_scalar_with_wire2_raises_cleanly():
    """Regression: packed encoding is only legal for REPEATED fields;
    a singular int32 arriving length-delimited must raise the clean
    wire-mismatch ValueError (→ NULL payload via middleware), not
    crash on the scalar default."""
    # field 1 (int32, singular) with wire type 2, length 1, one byte
    data = bytes([1 << 3 | 2, 1, 5])
    with pytest.raises(ValueError):
        decode(data, T_INT)


def test_struct_overrun_length_raises():
    """Regression (round-2 ADVICE): a Struct whose declared
    length-delimited size overruns the buffer is corruption and must
    raise — a silent slice-truncation would decode partial data as a
    'good' message and bypass the poison contract. Reproduces the
    advisor's case: inflate a length byte beyond the bytes remaining."""
    good = encode_struct({"k": "hello"})
    # Inflate the outermost entry length byte well past the buffer.
    bad = bytearray(good)
    bad[1] = 120
    with pytest.raises(ValueError):
        decode_struct(bytes(bad))


def test_struct_nested_overrun_raises():
    """Same contract one level down: corrupt the string_value length
    inside the map-entry's Value submessage."""
    good = bytearray(encode_struct({"k": ["a", {"x": 1.5}, None]}))
    # Find the last length byte and inflate it (any inner slice must
    # bounds-check, whichever field this lands on).
    for i in range(len(good) - 2, 0, -1):
        cand = bytearray(good)
        cand[i] = 0x7F
        try:
            decode_struct(bytes(cand))
        except (ValueError, UnicodeDecodeError):
            return  # raised cleanly — contract holds
    # If every single-byte inflation still decoded, the guard is gone.
    raise AssertionError("no corrupted variant raised")


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=96))
def test_decode_value_arbitrary_bytes(data):
    """Fuzz pin for the Value decoder specifically (struct_value,
    list_value, string_value recursion): clean errors only."""
    from ziggurat_spark.functions.protowire import _decode_value

    try:
        _decode_value(data)
    except (ValueError, UnicodeDecodeError):
        pass

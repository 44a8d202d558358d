"""Deserialization middleware — mirrors the reference's middleware
round-trip tests (middleware/default_test.clj, middleware/json.clj
nil-on-failure behavior, poison shunt messaging/consumer.clj:28-48)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ziggurat_spark.functions.middleware import (
    ingestion_time,
    json_field,
    json_value,
    pair_middleware,
    poison_split,
)


@pytest.fixture()
def raw(spark):
    rows = [
        Row(key=b"k1", value=b'{"k": 1, "s": "a"}'),
        Row(key=b"k2", value=b'{"k": 2, "s": "b"}'),
        Row(key=b"k3", value=b"not json at all"),
    ]
    return spark.createDataFrame(rows, "key binary, value binary")


def test_json_value_with_schema_nulls_on_failure(raw):
    out = json_value("k INT, s STRING")(raw).collect()
    by_key = {bytes(r.key): r.payload for r in out}
    assert by_key[b"k1"].k == 1 and by_key[b"k1"].s == "a"
    # malformed → NULL payload, the nil-on-failure contract (json.clj:31-39)
    assert by_key[b"k3"] is None


def test_json_value_schemaless_validity_flag(raw):
    out = json_value()(raw).collect()
    flags = {bytes(r.key): r.payload_valid for r in out}
    assert flags == {b"k1": True, b"k2": True, b"k3": False}


def test_json_field_projection_and_cast(raw):
    out = json_field("$.k", "k", cast="int")(raw).collect()
    assert {bytes(r.key): r.k for r in out} == {b"k1": 1, b"k2": 2, b"k3": None}


def test_poison_split_routes_raw_bytes(raw):
    parsed = json_value("k INT, s STRING")(raw)
    good, poison = poison_split(parsed)
    assert good.count() == 2
    bad = poison.collect()
    assert len(bad) == 1
    # the poison row keeps its original bytes untouched (R4: publish as-is)
    assert bytes(bad[0].value) == b"not json at all"


def test_ingestion_time_falls_back_to_wall_clock(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("b", None)], "id string, raw string"
    ).select("id", F.col("raw").cast("timestamp").alias("timestamp"))
    out = df.select("id", ingestion_time().alias("ts")).collect()
    by_id = {r.id: r.ts for r in out}
    assert by_id["a"].year == 2024
    assert by_id["b"] is not None  # wall clock substituted
    assert by_id["b"].year >= 2026


def test_pair_middleware_applies_per_side(spark):
    left = spark.createDataFrame(
        [Row(key=b"k", value=b'{"k": 10}')], "key binary, value binary"
    )
    right = spark.createDataFrame(
        [Row(key=b"k", value=b'{"k": 20}')], "key binary, value binary"
    )
    joined = left.select(F.struct("key", "value").alias("left")).crossJoin(
        right.select(F.struct("key", "value").alias("right"))
    )
    mw = pair_middleware(json_value("k INT"), json_value("k INT"))
    row = mw(joined).collect()[0]
    assert row.left.payload.k == 10
    assert row.right.payload.k == 20


def test_protobuf_middleware_gated(spark):
    """T4/T7: the proto middleware builds (pyspark.sql.protobuf ships
    with pyspark) but THIS environment has no spark-protobuf jar, no
    protoc, and no python protobuf — execution must fail with a clear
    error, never silently wrong data. On a real cluster the same
    middleware runs unchanged with the jar + a descriptor file."""
    import pytest as _pytest

    from ziggurat_spark.functions.middleware import protobuf_value

    mw = protobuf_value("Person", "/tmp/person.desc")
    df = spark.createDataFrame([(b"\x08\x01",)], "value binary")
    with _pytest.raises(Exception, match="person.desc"):
        # the failure must name the missing descriptor — a CLEAR
        # error, not an arbitrary crash
        mw(df).collect()


def test_json_value_malformed_utf8_routes_to_poison(spark):
    """Invalid UTF-8 bytes must become a NULL payload (poison, R4) —
    never a thrown MALFORMED_CHARACTER_CODING that kills the query."""
    from ziggurat_spark.functions.middleware import json_value, poison_split

    df = spark.createDataFrame(
        [
            (bytearray(b"\xff\xfe\x01"),),
            (bytearray(b'{"k": 3}'),),
        ],
        "value binary",
    )
    out = json_value(schema="k INT")(df)
    good, poison = poison_split(out)
    assert good.count() == 1 and good.first()["payload"]["k"] == 3
    assert poison.count() == 1


def test_json_value_scalar_and_array_are_poison(spark):
    """Valid-but-non-object JSON (bare scalar / array) would parse to
    an ambiguous all-NULL struct — gated to NULL payload instead."""
    from ziggurat_spark.functions.middleware import json_value, poison_split

    df = spark.createDataFrame(
        [
            (bytearray(b'"scalar"'),),
            (bytearray(b"[1, 2, 3]"),),
            (bytearray(b"5"),),
            (bytearray(b' {"k": 9}'),),
        ],
        "value binary",
    )
    good, poison = poison_split(json_value(schema="k INT")(df))
    assert good.count() == 1 and good.first()["payload"]["k"] == 9
    assert poison.count() == 3

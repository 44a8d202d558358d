"""Windowed stream-stream joins J1-J4 — mirrors the reference's join
tests (streams_test.clj:265-355: two topics, 6s window, inner/left/
outer) in both batch and Structured Streaming execution."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ziggurat_spark.operators.stream_joins import (
    pair_timestamp_diff_ms,
    windowed_join,
    windowed_join_chain,
)


def ts(sec: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, sec)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [("a", ts(0), "L0"), ("a", ts(10), "L10"), ("b", ts(0), "Lb")],
        "key string, timestamp timestamp, v string",
    )
    right = spark.createDataFrame(
        [("a", ts(3), "R3"), ("a", ts(30), "R30"), ("c", ts(0), "Rc")],
        "key string, timestamp timestamp, v string",
    )
    return left, right


def test_inner_join_band_and_key(spark, sides):
    left, right = sides
    out = windowed_join(left, right, join_window_ms=6000).collect()
    pairs = sorted((r.left.v, r.right.v) for r in out)
    # a@0-R3 within 6s; a@10 matches nothing (R3 is 7s away, R30 is 20s);
    # b/c keys never match
    assert pairs == [("L0", "R3")]


def test_left_join_emits_null_right(spark, sides):
    left, right = sides
    out = windowed_join(left, right, 6000, join_type="left").collect()
    got = sorted((r.left.v, r.right.v if r.right else None) for r in out)
    assert got == [("L0", "R3"), ("L10", None), ("Lb", None)]


def test_outer_join_emits_both_sides(spark, sides):
    left, right = sides
    out = windowed_join(left, right, 6000, join_type="outer").collect()
    pairs = sorted(
        (
            (r.left.v if r.left else None, r.right.v if r.right else None)
            for r in out
        ),
        key=lambda t: (t[0] or "", t[1] or ""),
    )
    # matched pair AND both null sides — an outer join that drops
    # matches (or unmatched rows) must fail here
    assert pairs == [
        (None, "R30"),
        (None, "Rc"),
        ("L0", "R3"),
        ("L10", None),
        ("Lb", None),
    ]


def test_invalid_join_type_raises(spark, sides):
    left, right = sides
    with pytest.raises(ValueError, match="join_type"):
        windowed_join(left, right, 6000, join_type="cross")


def test_three_way_chain(spark, sides):
    left, right = sides
    third = spark.createDataFrame(
        [("a", ts(2), "T2"), ("a", ts(50), "T50")],
        "key string, timestamp timestamp, v string",
    )
    out = windowed_join_chain(
        [("s1", left), ("s2", right), ("s3", third)], join_window_ms=6000
    ).collect()
    got = sorted((r.s1.v, r.s2.v, r.s3.v) for r in out)
    # chain carries the FIRST stream's (key, ts): L0@0 joins R3, then T2@2
    assert got == [("L0", "R3", "T2")]


def test_pair_timestamp_diff_metric(spark, sides):
    left, right = sides
    joined = windowed_join(left, right, 6000)
    d = joined.select(pair_timestamp_diff_ms(joined).alias("d")).collect()
    assert [r.d for r in d] == [3000]


def test_streaming_inner_join_availablenow(spark, sides, tmp_path):
    """J1 under real Structured Streaming: both sides watermarked,
    drained with availableNow (SURVEY §7.3 — no Thread/sleep)."""
    left, right = sides
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(ldir)
    right.write.parquet(rdir)
    ls = spark.readStream.schema(left.schema).parquet(ldir)
    rs = spark.readStream.schema(right.schema).parquet(rdir)
    joined = windowed_join(ls, rs, join_window_ms=6000)
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("wj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT left.v AS l, right.v AS r FROM wj_test").collect()
    assert sorted((r.l, r.r) for r in rows) == [("L0", "R3")]

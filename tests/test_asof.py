"""As-of join operator semantics: inclusive boundary, no-match NULLs,
per-key isolation, latest-wins."""

from __future__ import annotations

from datetime import datetime

import pytest

from ziggurat_spark.operators.asof import asof_join_backward


def ts(sec: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0) + __import__("datetime").timedelta(
        seconds=sec
    )


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [("a", ts(10), "L1"), ("a", ts(20), "L2"), ("b", ts(10), "L3"),
         ("c", ts(10), "L4")],
        "k string, t timestamp, lv string",
    )
    right = spark.createDataFrame(
        [("a", ts(5), "R5"), ("a", ts(10), "R10"), ("a", ts(15), "R15"),
         ("b", ts(99), "R99")],
        "k string, t timestamp, rv string",
    )
    return left, right


def test_backward_asof_semantics(spark, sides):
    left, right = sides
    out = asof_join_backward(left, right, ["k"], "t", "t")
    got = {r.lv: (r.rv, r.asof_t.second if r.asof_t else None) for r in out.collect()}
    assert got["L1"] == ("R10", 10)  # inclusive: equal ts matches
    assert got["L2"] == ("R15", 15)  # latest at-or-before, not first
    assert got["L3"] == (None, None)  # right exists but only AFTER left
    assert got["L4"] == (None, None)  # key absent from right


def test_left_rows_always_preserved(spark, sides):
    left, right = sides
    out = asof_join_backward(left, right, ["k"], "t", "t")
    assert out.count() == left.count()
    assert set(out.columns) == {"k", "t", "lv", "asof_t", "rv"}


def test_forward_asof_semantics(spark, sides):
    from ziggurat_spark.operators.asof import asof_join_forward

    left, right = sides
    out = asof_join_forward(left, right, ["k"], "t", "t")
    got = {r.lv: (r.rv, r.asof_t.second if r.asof_t else None) for r in out.collect()}
    assert got["L1"] == ("R10", 10)  # inclusive: equal ts matches
    assert got["L2"] == (None, None)  # nothing at-or-after 20 for key a
    assert got["L3"] == ("R99", 39)  # earliest following (99s = 1m39s)
    assert got["L4"] == (None, None)  # key absent from right


def test_forward_left_rows_always_preserved(spark, sides):
    from ziggurat_spark.operators.asof import asof_join_forward

    left, right = sides
    out = asof_join_forward(left, right, ["k"], "t", "t")
    assert out.count() == left.count()
    assert set(out.columns) == {"k", "t", "lv", "asof_t", "rv"}


def test_asof_rejects_column_collisions(spark):
    """Right payload columns sharing a name with a left column would
    produce a duplicate-named output — rejected at call time."""
    import pytest

    from ziggurat_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([(1, 10, 5)], "k int, lts int, v int")
    right = spark.createDataFrame([(1, 9, 7)], "k int, rts int, v int")
    with pytest.raises(ValueError, match="collide with left columns"):
        asof_join_backward(left, right, ["k"], "lts", "rts")
    # renamed payload is fine
    ok = asof_join_backward(
        left, right.withColumnRenamed("v", "rv"), ["k"], "lts", "rts"
    )
    assert ok.columns == ["k", "lts", "v", "asof_rts", "rv"]
    # reserved internal names rejected
    bad = spark.createDataFrame([(1, 9, 7)], "k int, rts int, _tag int")
    with pytest.raises(ValueError, match="reserved"):
        asof_join_backward(left, bad, ["k"], "lts", "rts")

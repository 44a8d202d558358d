"""Retry-fabric semantics: the R2 state machine, R3 backoff timing,
the pump, and dead-set ops (R7) — behavior parity with
messaging/producer.clj:175-300 and messaging/dead_set.clj:6-28."""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F

from ziggurat_spark.envelope import ensure_envelope
from ziggurat_spark.streaming.retry_fabric import RetryConfig, RetryFabric

NOW = datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc)


def make_env(spark, n=4, attempt=None):
    df = spark.range(n).select(
        F.encode(F.col("id").cast("string"), "UTF-8").alias("key"),
        F.encode(F.concat(F.lit('{"k": '), F.col("id"), F.lit("}")), "UTF-8").alias(
            "value"
        ),
        F.lit("t").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("id").alias("offset"),
        F.lit(NOW).alias("timestamp"),
        F.lit(attempt).cast("int").alias("attempt"),
    )
    return ensure_envelope(df)


@pytest.fixture()
def fabric(spark, tmp_path):
    return RetryFabric(spark, os.path.join(str(tmp_path), "fabric"))


def test_first_failure_starts_countdown(spark, fabric):
    cfg = RetryConfig(max_attempts=5, timeout_ms=5000)
    fabric.enqueue_retry(make_env(spark), "r1", cfg, now=NOW)
    t = fabric.retry_table()
    rows = t.collect()
    assert len(rows) == 4
    assert all(r["attempt"] == 4 for r in rows)  # 5 - 1 remaining
    assert all(r["max_attempts"] == 5 for r in rows)
    # linear backoff: fixed 5000 ms (config.clj:40)
    assert all(
        r["next_attempt_at"].replace(tzinfo=timezone.utc)
        == NOW + timedelta(milliseconds=5000)
        for r in rows
    )


def test_zero_remaining_goes_to_dead_set(spark, fabric):
    cfg = RetryConfig(max_attempts=5)
    fabric.enqueue_retry(make_env(spark, attempt=0), "r1", cfg, now=NOW)
    assert fabric.retry_table() is None
    dead = fabric.dead_set_table().collect()
    assert len(dead) == 4
    assert all(not r["poison"] for r in dead)


def test_exponential_backoff_grows_per_hop(spark, fabric):
    # producer.clj:204: ((2^n)-1)*t with n = min(25, max) - remaining
    cfg = RetryConfig(max_attempts=5, timeout_ms=1000, exponential=True)
    for attempt, expected_ms in [(None, 1000), (4, 3000), (3, 7000), (1, 31000)]:
        f2 = RetryFabric(spark, fabric.workdir + f"-{attempt}")
        f2.enqueue_retry(make_env(spark, n=1, attempt=attempt), "r", cfg, now=NOW)
        row = f2.retry_table().collect()[0]
        got = row["next_attempt_at"].replace(tzinfo=timezone.utc)
        assert got == NOW + timedelta(milliseconds=expected_ms), attempt


def test_retry_disabled_sends_straight_to_dead_set(spark, fabric):
    cfg = RetryConfig(enabled=False)
    fabric.enqueue_retry(make_env(spark), "r1", cfg, now=NOW)
    assert fabric.retry_table() is None
    assert fabric.dead_set_table().count() == 4


def test_pump_respects_next_attempt_at(spark, fabric):
    cfg = RetryConfig(max_attempts=3, timeout_ms=60_000)
    fabric.enqueue_retry(make_env(spark), "r1", cfg, now=NOW)
    delivered = []
    # before the deadline: nothing is due ("not before" guarantee)
    n = fabric.pump("r1", lambda df, ch: delivered.append(df.count()), now=NOW)
    assert n == 0 and delivered == []
    after = NOW + timedelta(milliseconds=60_001)
    n = fabric.pump("r1", lambda df, ch: delivered.append(df.count()), now=after)
    assert n == 4 and delivered == [4]
    # queue drained
    assert fabric.retry_table() is None


def test_pump_is_route_scoped(spark, fabric):
    cfg = RetryConfig(max_attempts=3, timeout_ms=0)
    fabric.enqueue_retry(make_env(spark, n=2), "a", cfg, now=NOW)
    fabric.enqueue_retry(make_env(spark, n=3), "b", cfg, now=NOW)
    later = NOW + timedelta(seconds=1)
    assert fabric.pump("a", lambda df, ch: None, now=later) == 2
    assert fabric.retry_table().count() == 3  # route b untouched


def test_poison_shunt_marks_dead_rows(spark, fabric):
    fabric.enqueue_dead(make_env(spark, n=2), "r1", poison=True, now=NOW)
    dead = fabric.dead_set_table().collect()
    assert len(dead) == 2 and all(r["poison"] for r in dead)


def test_dead_set_view_replay_delete(spark, fabric):
    fabric.enqueue_dead(make_env(spark, n=6, attempt=0), "r1", now=NOW)
    assert fabric.dead_set_view("r1", 3).count() == 3
    assert fabric.dead_set_view("other", 3).count() == 0

    replayed = []
    k = fabric.dead_set_replay("r1", 2, lambda df: replayed.append(df.count()))
    assert k == 2 and replayed == [2]
    assert fabric.dead_set_table().count() == 4

    assert fabric.dead_set_delete("r1", 10) == 4
    assert fabric.dead_set_table() is None


def test_replay_resets_attempt_counter(spark, fabric):
    fabric.enqueue_dead(make_env(spark, n=1, attempt=0), "r1", now=NOW)
    seen = []
    fabric.dead_set_replay("r1", 1, lambda df: seen.extend(df.collect()))
    assert seen[0]["attempt"] is None  # fresh countdown on replay

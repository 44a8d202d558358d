"""Tumbling/sliding/session window aggregation + watermark late-data
drop — the streaming-only semantics checklist from SURVEY §2.2,
verified with deterministic event times (no Thread/sleep; SURVEY
§7.3 drain pattern)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ziggurat_spark.operators.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


def ts(minute: int, sec: int = 0) -> datetime:
    return datetime(2024, 1, 1, 0, minute, sec)


@pytest.fixture()
def events(spark):
    rows = [
        ("u1", ts(0, 10), 1.0),
        ("u1", ts(0, 50), 2.0),
        ("u1", ts(1, 10), 4.0),
        ("u2", ts(0, 30), 8.0),
        ("u2", ts(5, 0), 16.0),
    ]
    return spark.createDataFrame(rows, "key string, timestamp timestamp, v double")


def test_tumbling_batch(spark, events):
    out = tumbling_window_agg(
        events, "1 minute", {"n": F.count("*"), "sv": F.sum("v")}, keys=("key",)
    ).collect()
    got = {(r.key, r.win_start.minute): (r.n, r.sv) for r in out}
    assert got == {
        ("u1", 0): (2, 3.0),
        ("u1", 1): (1, 4.0),
        ("u2", 0): (1, 8.0),
        ("u2", 5): (1, 16.0),
    }


def test_sliding_batch(spark, events):
    out = sliding_window_agg(
        events, "2 minutes", "1 minute", {"n": F.count("*")}, keys=("key",)
    ).collect()
    # u1@0:10 lands in windows [-1,1) and [0,2); u1@1:10 in [0,2) and [1,3)
    u1 = {r.win_start.minute if r.win_start.year == 2024 else -1: r.n
          for r in out if r.key == "u1" and r.win_start.year == 2024}
    assert u1[0] == 3  # both 0-minute events + the 1-minute event
    assert u1[1] == 1


def test_session_batch(spark, events):
    out = session_window_agg(
        events, "2 minutes", {"n": F.count("*")}, keys=("key",)
    ).collect()
    by_key = sorted((r.key, r.n) for r in out)
    # u1: all three events within 2-minute gaps → one session of 3
    # u2: 0:30 and 5:00 are > 2min apart → two sessions of 1
    assert by_key == [("u1", 3), ("u2", 1), ("u2", 1)]


def test_streaming_tumbling_with_watermark_drops_late(spark, tmp_path):
    """Two micro-batches: batch 1 advances the watermark to 0:09:00;
    batch 2's 0:01 event is older than watermark − delay → dropped.
    The on-time 0:08 event in the same file survives."""
    src = str(tmp_path / "src")
    b1 = spark.createDataFrame(
        [("u1", ts(0, 30), 1.0), ("u1", ts(9, 0), 1.0)],
        "key string, timestamp timestamp, v double",
    )
    # batch 2: one late row (1:00 « watermark 8:00), one on-time row
    # (8:30), one advancer (10:30) that pushes the watermark to 9:30
    # so the on-time window [8,9) closes and emits.
    b2 = spark.createDataFrame(
        [
            ("u1", ts(1, 0), 100.0),
            ("u1", ts(8, 30), 1.0),
            ("u1", ts(10, 30), 1.0),
        ],
        "key string, timestamp timestamp, v double",
    )
    b1.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = tumbling_window_agg(
        stream,
        "1 minute",
        {"n": F.count("*"), "sv": F.sum("v")},
        keys=("key",),
        watermark="1 minute",
    )
    emitted = []

    def run_round() -> None:
        q = (
            agg.writeStream.foreachBatch(
                lambda bdf, _bid: emitted.extend(bdf.collect())
            )
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .start()
        )
        q.awaitTermination(120)

    run_round()
    # second batch arrives after the first run established the watermark
    b2.coalesce(1).write.mode("append").parquet(src)
    run_round()
    minutes = {r.win_start.minute: (r.n, r.sv) for r in emitted}
    # the late minute-1 row (sv=100) must NOT appear anywhere
    assert all(sv < 100 for _, sv in minutes.values())
    assert 8 in minutes  # the on-time row emitted once watermark passed

"""Windowed aggregations — tumbling / sliding / session.

The reference has NO windowed aggregation (its only window is the
stream-join band, streams.clj:149-158; aggregations are framework
metrics only — SURVEY §2.1). These are the declared capability
superset (SURVEY §2.2 streaming checklist): the standard Structured
Streaming `window()` / `session_window()` group-bys with an explicit
watermark bound, usable identically on batch DataFrames (where the
watermark is a no-op).

Scale: windowed aggregation shuffles on (window, *keys); state per
key×window is evicted at the watermark, so state size is bounded by
(watermark horizon / slide) × key cardinality — independent of
stream length. Partial aggregation (map-side combine) applies before
the shuffle for all algebraic aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _prep(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    if df.isStreaming and watermark:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_agg(
    df: DataFrame,
    duration: str,
    aggs: dict[str, Column],
    ts_col: str = "timestamp",
    keys: tuple[str, ...] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows: one row per (window, keys)."""
    df = _prep(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration).alias("win"), *keys)
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            *aggs.keys(),
        )
    )


def sliding_window_agg(
    df: DataFrame,
    duration: str,
    slide: str,
    aggs: dict[str, Column],
    ts_col: str = "timestamp",
    keys: tuple[str, ...] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows every ``slide``; each event lands in
    duration/slide windows."""
    df = _prep(df, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("win"), *keys)
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            *aggs.keys(),
        )
    )


def session_window_agg(
    df: DataFrame,
    gap: str,
    aggs: dict[str, Column],
    ts_col: str = "timestamp",
    keys: tuple[str, ...] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Data-driven windows that close after ``gap`` of inactivity
    per key (streaming requires both a watermark and grouping keys)."""
    df = _prep(df, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), *keys)
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *keys,
            *aggs.keys(),
        )
    )

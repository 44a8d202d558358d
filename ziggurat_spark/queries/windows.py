"""Window-function surface (Z20–Z23): ranking, lag, running frames,
top-k. The reference's kafka-delay metric (kafka_delay.clj:5-13) is a
per-key consecutive-event gap — exactly ``lag`` over (key, time).

Scale notes: window functions shuffle once on the partition key and
sort within partitions; user_id has high cardinality so partitions
stay balanced (AQE splits stragglers). Top-k uses orderBy+limit which
Spark executes as TakeOrderedAndProject — no global sort
materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


@register(
    "z20_row_number",
    oracle=(
        "SELECT event_id, user_id, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn "
        "FROM events ORDER BY event_id LIMIT 5000"
    ),
    doc="Per-key sequence numbers (deterministic tie-break on event_id).",
    tags=("window",),
)
def z20(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("event_id", "user_id", F.row_number().over(w).alias("rn"))
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "z21_lag_gap",
    oracle=(
        "SELECT event_id, epoch_us(ts) - epoch_us(lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us "
        "FROM events ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Consecutive-event delay per key ≈ the kafka_delay metric "
        "(kafka_delay.clj:5-13). Gap emitted as exact epoch-microsecond "
        "difference so both engines hash identically."
    ),
    tags=("window",),
)
def z21(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    return e.select("event_id", gap.alias("gap_us")).orderBy("event_id").limit(5000)


@register(
    "z22_running_sum",
    oracle=(
        "SELECT event_id, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 AS rv "
        "FROM events ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Explicit-frame running sum per key; summed in exact integer "
        "cents (see aggs.py determinism note)."
    ),
    tags=("window",),
)
def z22(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    rv = (
        F.sum(F.round(F.col("value") * 100).cast("long")).over(w).cast("double") / 100
    )
    return e.select("event_id", rv.alias("rv")).orderBy("event_id").limit(5000)


@register(
    "z23_topk",
    oracle=(
        "SELECT event_id, value FROM events "
        "ORDER BY value DESC, event_id LIMIT 100"
    ),
    doc=(
        "Top-k (dead-set peek R7 ≈ bounded read, "
        "messaging/consumer.clj:84-94). Executes as "
        "TakeOrderedAndProject: per-partition heaps, no global sort."
    ),
    tags=("window", "limit"),
)
def z23(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return (
        e.select("event_id", "value")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(100)
    )


@register(
    "x_window_analytics",
    oracle=(
        "SELECT event_id, "
        "ntile(4) OVER w AS quartile, "
        "percent_rank() OVER w AS pr, "
        "dense_rank() OVER w AS dr, "
        "first_value(event_id) OVER w AS first_id "
        "FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
        "ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Analytic-function pack: ntile/percent_rank/dense_rank/"
        "first_value share ONE window spec, so Catalyst plans a "
        "single exchange + sort for all four. percent_rank's "
        "(rank-1)/(n-1) is a fixed IEEE expression — identical "
        "across engines. Same single-shuffle scale shape as Z20."
    ),
    tags=("window",),
)
def x_window_analytics(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "event_id",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pr"),
            F.dense_rank().over(w).alias("dr"),
            F.first("event_id").over(w).alias("first_id"),
        )
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "x_sliding_window",
    oracle=(
        "SELECT CAST(date_trunc('hour', ts) - o * INTERVAL 1 HOUR "
        "AS VARCHAR) AS win_start, count(*) AS n, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv100 "
        "FROM events, (SELECT unnest([0, 1]) AS o) "
        "GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "Sliding-window aggregate (2h window, 1h slide) via Spark's "
        "native window() — the batch spelling of the Structured "
        "Streaming windowed agg (SURVEY §2 streaming checklist). "
        "Spark plans window() as an Expand (each row replicated "
        "window/slide = 2×) into ONE partial-agg shuffle; the DuckDB "
        "oracle spells the same expansion as an unnest cross join. "
        "Epoch-aligned starts make both engines agree exactly; start "
        "emitted as ISO string for dtype-identical hashing."
    ),
    tags=("window", "time"),
)
def x_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("sv100"),
        )
        .select(
            F.col("w.start").cast("string").alias("win_start"), "n", "sv100"
        )
        .orderBy("win_start")
    )


@register(
    "x_window_frames",
    oracle=(
        "SELECT event_id, lead(event_id) OVER w AS next_id, "
        "nth_value(event_id, 2) OVER w AS second_id, "
        "cume_dist() OVER w AS cd, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER ("
        "PARTITION BY user_id ORDER BY CAST(epoch(ts) AS BIGINT) "
        "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS hour_sum "
        "FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
        "ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Frame-spec pack: lead / nth_value (default running frame) / "
        "cume_dist plus a RANGE frame over epoch seconds (trailing "
        "1-hour sum — the kafka_delay-style trailing metric as a "
        "window). The RANGE ordering key is a BIGINT epoch on both "
        "engines (interval-typed range frames differ in spelling); "
        "the trailing sum is exact hundredths. lead/nth_value/"
        "cume_dist share one window spec → one exchange + sort; the "
        "RANGE frame adds a second sort on the same partitioning, no "
        "extra shuffle."
    ),
    tags=("window", "frames"),
)
def x_window_frames(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wr = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return (
        e.select(
            "event_id",
            F.lead("event_id").over(w).alias("next_id"),
            F.nth_value("event_id", 2).over(w).alias("second_id"),
            F.cume_dist().over(w).alias("cd"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .over(wr)
            .cast("bigint")
            .alias("hour_sum"),
        )
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "x_range_interval_frame",
    oracle=(
        "WITH s AS (SELECT event_id, event_type, ts, "
        "CAST(round(value * 100) AS BIGINT) AS v100 FROM events) "
        "SELECT event_id, "
        "count(*) OVER w AS trailing_n, "
        "CAST(sum(v100) OVER w AS BIGINT) AS trailing_sum "
        "FROM s WINDOW w AS (PARTITION BY event_type ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
        "ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Native INTERVAL range frame: the trailing-hour count/sum "
        "per event using RANGE BETWEEN INTERVAL ... PRECEDING "
        "directly over the timestamp — the declarative spelling of "
        "the reference's delay-window metrics, complementing "
        "x_window_frames' epoch-seconds arithmetic with the engine's "
        "first-class time-typed frame. Identical frame semantics on "
        "both engines (tied timestamps share the frame). One shuffle "
        "on event_type + per-partition sort; frame state is the "
        "in-window rows — O(events per hour), not O(partition)."
    ),
    tags=("window", "range", "time"),
)
def x_range_interval_frame(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select(
        "event_id",
        "event_type",
        "ts",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
    )
    over = (
        "OVER (PARTITION BY event_type ORDER BY ts RANGE BETWEEN "
        "INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
    )
    return (
        e.select(
            "event_id",
            F.expr(f"count(*) {over}").alias("trailing_n"),
            F.expr(f"CAST(sum(v100) {over} AS BIGINT)").alias(
                "trailing_sum"
            ),
        )
        .orderBy("event_id")
        .limit(5000)
    )

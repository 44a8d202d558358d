"""Envelope / projection / filter / scalar-function surface (Z01–Z06).

These are the batch-SQL embodiments of the reference's per-record
transform chain: scan + project (T1 mapValues, streams.clj:66-71),
the staleness filter (T2, timestamp_transformer.clj:9-12), and the
scalar-expression vocabulary a handler uses. All pure built-in
column expressions → whole-stage codegen, filters and projections
push down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


@register(
    "z01_scan_project",
    oracle="SELECT event_id, event_type, value FROM events ORDER BY event_id",
    doc="Scan + projection; column pruning reaches the parquet reader.",
    tags=("envelope",),
)
def z01(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "events")
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    )


@register(
    "z02_staleness_filter",
    oracle=(
        "SELECT count(*) AS n FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'"
    ),
    doc=(
        "Staleness cutoff (T2): drop records older than a horizon "
        "(timestamp_transformer.clj:9-12; default 7d streams.clj:26). "
        "Literal timestamp so the oracle is deterministic."
    ),
    tags=("envelope", "filter"),
)
def z02(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "events")
        .filter(F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "z03_predicate_combo",
    oracle=(
        "SELECT event_id FROM events "
        "WHERE event_type = 'click' AND value > 100.0 ORDER BY event_id"
    ),
    doc="Conjunctive predicates pushed to the scan (PushedFilters).",
    tags=("envelope", "filter"),
)
def z03(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load_table(spark, sf, "events")
        .filter((F.col("event_type") == "click") & (F.col("value") > 100.0))
        .select("event_id")
        .orderBy("event_id")
    )


@register(
    "z04_string_fns",
    oracle=(
        "SELECT event_id, upper(event_type) AS t, length(props) AS lp, "
        "substr(event_type, 1, 3) AS pre FROM events ORDER BY event_id"
    ),
    doc="String-function vocabulary of a transform handler (T1).",
    tags=("envelope", "scalar"),
)
def z04(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return e.select(
        "event_id",
        F.upper("event_type").alias("t"),
        F.length("props").cast("long").alias("lp"),
        F.substring("event_type", 1, 3).alias("pre"),
    ).orderBy("event_id")


@register(
    "z05_date_fns",
    oracle=(
        "SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS d, "
        "count(*) AS n FROM events GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "Event-time bucketing by day (the batch analogue of a tumbling "
        "window). The day key is emitted as its ISO string so both "
        "engines hand pandas the identical dtype (pandas has no date "
        "dtype — DuckDB DATE round-trips as datetime64, Spark DATE as "
        "object — which would hash differently driver-side)."
    ),
    tags=("envelope", "time"),
)
def z05(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(
            F.date_trunc("day", "ts").cast("date").cast("string").alias("d")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("d")
    )


@register(
    "z06_math_conditional",
    oracle=(
        "SELECT event_id, round(value * 100, 2) AS v, "
        "CASE WHEN value > 100.0 THEN 'hi' ELSE 'lo' END AS band, "
        "coalesce(user_id, -1) AS uid FROM events ORDER BY event_id"
    ),
    doc="Arithmetic + CASE + coalesce — the scalar core of outcome routing.",
    tags=("envelope", "scalar"),
)
def z06(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return e.select(
        "event_id",
        F.round(F.col("value") * 100, 2).alias("v"),
        F.when(F.col("value") > 100.0, "hi").otherwise("lo").alias("band"),
        F.coalesce(F.col("user_id"), F.lit(-1)).alias("uid"),
    ).orderBy("event_id")

"""Outcome routing & retry math as pure column logic (Z07–Z09).

The reference dispatches on a handler's return keyword
(:success/:retry/:skip/:dead-letter — mapper.clj:55-65), decrements a
retry counter carried in the message (producer.clj:288-293), and
computes exponential backoff ``((2^n)-1)*timeout`` with
``n = clamp(min(25, retry-count) - message-retry-count, 1, ..)``
(producer.clj:175-224, MAX_EXPONENTIAL_RETRIES=25 at :20).

Here each rule is a deterministic column expression over ``events``
so the DuckDB oracle can hash-check the exact semantics. The live
streaming engine reuses the same expressions
(ziggurat_spark.operators.routing / functions.backoff).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.functions.backoff import backoff_ms_expr
from ziggurat_spark.operators.routing import outcome_expr, retry_step_exprs
from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


@register(
    "z07_outcome_dispatch",
    oracle=(
        "SELECT event_id, CASE WHEN value < 10.0 THEN 'retry' "
        "WHEN value < 20.0 THEN 'skip' WHEN value < 30.0 THEN 'dead-letter' "
        "ELSE 'success' END AS outcome FROM events ORDER BY event_id"
    ),
    doc="R1 mapper-func dispatch (mapper.clj:55-65) as a CASE column.",
    tags=("routing",),
)
def z07(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return e.select("event_id", outcome_expr(F.col("value")).alias("outcome")).orderBy(
        "event_id"
    )


@register(
    "z08_retry_state_machine",
    oracle=(
        "SELECT event_id, "
        "CASE WHEN event_id % 7 = 0 THEN 5 ELSE (event_id % 7) - 1 END AS next_attempt, "
        "(event_id % 7) = 0 AS to_dead_set FROM events ORDER BY event_id"
    ),
    doc=(
        "R2 retry decrement / DLQ split (producer.clj:288-293) with "
        "max_retries=5 and attempt := event_id % 7 as the fixture."
    ),
    tags=("routing",),
)
def z08(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    attempt = (F.col("event_id") % 7).cast("int")
    next_attempt, to_dead_set = retry_step_exprs(attempt, max_retries=5)
    return e.select(
        "event_id",
        next_attempt.alias("next_attempt"),
        to_dead_set.alias("to_dead_set"),
    ).orderBy("event_id")


@register(
    "z09_exponential_backoff",
    oracle=(
        "SELECT g AS message_retry_count, "
        "(power(2, greatest(1, least(25, 5) - g)) - 1) * 5000 AS backoff_ms "
        "FROM (SELECT DISTINCT event_id % 6 AS g FROM events) s ORDER BY g"
    ),
    doc=(
        "R3 exponential backoff ((2^n)-1)*t, n clamped >= 1, cap 25 "
        "(producer.clj:204, :20); t=5000ms, retry-count=5."
    ),
    tags=("routing",),
)
def z09(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    g = e.select((F.col("event_id") % 6).alias("g")).distinct()
    return g.select(
        F.col("g").alias("message_retry_count"),
        backoff_ms_expr(
            F.col("g"), retry_count=5, timeout_ms=5000, exponential=True
        ).alias("backoff_ms"),
    ).orderBy("message_retry_count")


@register(
    "x_route_pipeline",
    oracle=(
        "WITH routed AS (SELECT "
        "CASE WHEN value < 10 THEN 'retry' WHEN value < 20 THEN 'skip' "
        "WHEN value < 30 THEN 'dead-letter' ELSE 'success' END AS outcome, "
        "CAST(json_extract(props, '$.k') AS INT) AS k, "
        "CASE WHEN event_id % 7 = 0 THEN 5 ELSE event_id % 7 - 1 END "
        "AS next_attempt "
        "FROM events WHERE ts >= TIMESTAMP '2024-01-02 00:00:00') "
        "SELECT outcome, count(*) AS n, "
        "CAST(sum(k) AS BIGINT) AS sum_k, "
        "min((power(2, greatest(1, least(25, 5) - next_attempt)) - 1) * 5000) "
        "AS min_backoff_ms, "
        "max((power(2, greatest(1, least(25, 5) - next_attempt)) - 1) * 5000) "
        "AS max_backoff_ms "
        "FROM routed GROUP BY outcome ORDER BY outcome"
    ),
    doc=(
        "The FLAGSHIP route pipeline (what entry() runs) as a graded "
        "query: staleness filter (T2) → JSON middleware (T6) → "
        "outcome dispatch (R1) → retry state machine (R2, "
        "producer.clj:288-293) → exponential backoff (R3, the exact "
        "((2^n)-1)*t formula from producer.clj:204) → per-outcome "
        "tallies (the metrics surface). Every stage is a column "
        "expression inside one codegen span; the only shuffle is the "
        "4-group aggregate."
    ),
    tags=("routing", "pipeline"),
)
def x_route_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.functions.backoff import backoff_ms_expr
    from ziggurat_spark.operators.routing import outcome_expr, retry_step_exprs

    e = load_table(spark, sf, "events")
    fresh = e.filter(
        F.col("ts") >= F.lit("2024-01-02 00:00:00").cast("timestamp")
    )
    parsed = fresh.withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    routed = parsed.withColumn("outcome", outcome_expr(F.col("value")))
    attempt = (F.col("event_id") % 7).cast("int")
    next_attempt, _to_dead = retry_step_exprs(attempt, max_retries=5)
    routed = routed.withColumn("next_attempt", next_attempt).withColumn(
        "backoff_ms", backoff_ms_expr(F.col("next_attempt"), exponential=True)
    )
    return (
        routed.groupBy("outcome")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("backoff_ms").alias("min_backoff_ms"),
            F.max("backoff_ms").alias("max_backoff_ms"),
        )
        .orderBy("outcome")
    )

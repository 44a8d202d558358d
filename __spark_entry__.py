"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship route pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — the declared surface from
SURVEY.md §2.2, registered in ziggurat_spark.queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full ziggurat route pipeline, batch form, on
    sf0.001 events — staleness filter (T2) → JSON middleware (T6) →
    outcome dispatch (R1) → retry state machine + backoff (R2/R3) →
    per-outcome tallies (the metrics surface)."""
    from pyspark.sql import functions as F

    from ziggurat_spark.functions.backoff import backoff_ms_expr
    from ziggurat_spark.operators.routing import outcome_expr, retry_step_exprs
    from ziggurat_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    e = load_table(spark, sf, "events")
    fresh = e.filter(F.col("ts") >= F.lit("2024-01-02 00:00:00").cast("timestamp"))
    parsed = fresh.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
    routed = parsed.withColumn("outcome", outcome_expr(F.col("value")))
    attempt = (F.col("event_id") % 7).cast("int")
    next_attempt, to_dead_set = retry_step_exprs(attempt, max_retries=5)
    routed = routed.withColumn("next_attempt", next_attempt).withColumn(
        "backoff_ms",
        backoff_ms_expr(F.col("next_attempt"), exponential=True),
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ziggurat_spark.queries import all_queries

    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from ziggurat_spark.queries import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }

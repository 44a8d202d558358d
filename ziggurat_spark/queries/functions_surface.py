"""Function-surface breadth: array/higher-order, typed-JSON and
null-handling packs — the scalar/collection function coverage a user
of any engine leans on daily, each spelled in Spark built-ins with
the DuckDB-equivalent oracle (engine-specific names, same results).

All three are single-scan, zero-or-one-shuffle plans; the point here
is breadth of the expression surface, not plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


@register(
    "x_array_functions",
    oracle=(
        "SELECT doc_id, len(string_split(text, ' ')) AS n_words, "
        "array_to_string(list_sort(list_distinct(string_split(text, ' ')))"
        "[1:3], ',') AS first3, "
        "len(list_distinct(string_split(text, ' '))) AS n_distinct "
        "FROM documents ORDER BY doc_id"
    ),
    doc=(
        "Array/collection pack: split → distinct → sort → slice → "
        "join, all JVM-side generators/codegen (Spark sort_array/"
        "array_distinct/slice/array_join ≡ DuckDB list_* spellings). "
        "One scan, no shuffle before the deterministic orderBy."
    ),
    tags=("functions", "array"),
)
def x_array_functions(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    words = F.split("text", " ")
    distinct = F.array_distinct(words)
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_join(F.slice(F.sort_array(distinct), 1, 3), ",").alias(
            "first3"
        ),
        F.size(distinct).alias("n_distinct"),
    ).orderBy("doc_id")


@register(
    "x_json_typed",
    oracle=(
        "SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS kmod, "
        "count(*) AS n, "
        "CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sk "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "Typed JSON extraction (T6 middleware, middleware/json.clj): "
        "from_json with an explicit schema — the idiomatic-Spark "
        "replacement for 'middleware decides the schema' (SURVEY "
        "§1.2) — then plain typed aggregation. Schema-on-read stays "
        "columnar: the JSON parse happens once inside codegen."
    ),
    tags=("functions", "json"),
)
def x_json_typed(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    k = F.from_json("props", "k INT").getField("k")
    return (
        e.select((k % 10).alias("kmod"), k.alias("k"))
        .groupBy("kmod")
        .agg(F.count("*").alias("n"), F.sum("k").alias("sk"))
        .orderBy("kmod")
    )


@register(
    "x_null_functions",
    oracle=(
        "SELECT event_id, "
        "coalesce(nullif(event_type, 'click'), '<was-click>') AS t, "
        "least(value, 50.0) AS lo, greatest(value, 50.0) AS hi, "
        "CASE WHEN user_id IS NULL THEN -1 ELSE user_id END AS uid "
        "FROM events ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Null-handling pack: nullif/coalesce/least/greatest/IS NULL "
        "— identical three-valued-logic semantics on both engines, "
        "pure projection inside one codegen span."
    ),
    tags=("functions", "null"),
)
def x_null_functions(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return (
        e.select(
            "event_id",
            F.coalesce(
                F.nullif("event_type", F.lit("click")), F.lit("<was-click>")
            ).alias("t"),
            F.least("value", F.lit(50.0)).alias("lo"),
            F.greatest("value", F.lit(50.0)).alias("hi"),
            F.when(F.col("user_id").isNull(), -1)
            .otherwise(F.col("user_id"))
            .alias("uid"),
        )
        .orderBy("event_id")
        .limit(5000)
    )

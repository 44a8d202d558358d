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


@register(
    "x_string_functions",
    oracle=(
        "SELECT event_id, lpad(event_type, 8, '_') AS padded, "
        "reverse(event_type) AS rev, "
        "translate(event_type, 'aeiou', 'AEIOU') AS tr, "
        "repeat(substr(event_type, 1, 2), 2) AS rep, "
        "instr(event_type, 'i') AS pos, "
        "concat_ws('-', event_type, CAST(event_id % 10 AS VARCHAR)) AS joined, "
        "trim(concat(' ', event_type, ' ')) AS trimmed "
        "FROM events ORDER BY event_id"
    ),
    doc=(
        "String pack: pad/reverse/translate/repeat/locate/concat_ws/"
        "trim — all JVM codegen expressions (T1 mapValues transforms "
        "that never need Python, SURVEY §4.2). Single scan, "
        "deterministic orderBy."
    ),
    tags=("functions", "string"),
)
def x_string_functions(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    t = F.col("event_type")
    return e.select(
        "event_id",
        F.lpad(t, 8, "_").alias("padded"),
        F.reverse(t).alias("rev"),
        F.translate(t, "aeiou", "AEIOU").alias("tr"),
        F.repeat(F.substring(t, 1, 2), 2).alias("rep"),
        F.instr(t, "i").cast("bigint").alias("pos"),
        F.concat_ws("-", t, (F.col("event_id") % 10).cast("string")).alias(
            "joined"
        ),
        F.trim(F.concat(F.lit(" "), t, F.lit(" "))).alias("trimmed"),
    ).orderBy("event_id")


@register(
    "x_datetime_functions",
    oracle=(
        "SELECT event_id, CAST(year(ts) AS INT) AS y, "
        "CAST(quarter(ts) AS INT) AS q, CAST(month(ts) AS INT) AS mo, "
        "CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h, "
        "CAST(dayofyear(ts) AS INT) AS doy, "
        "CAST(last_day(ts) AS VARCHAR) AS eom, "
        "CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) "
        "AS days_since "
        "FROM events ORDER BY event_id"
    ),
    doc=(
        "Datetime pack: calendar extraction (year/quarter/month/day/"
        "hour/dayofyear), month-end, and day arithmetic against a "
        "literal epoch — the pieces of the staleness filter (T2) and "
        "delay metrics (kafka_delay.clj:5-13) spelled as codegen "
        "expressions. Date outputs emitted as ISO strings so both "
        "engines hash identically (FIXTURES §3)."
    ),
    tags=("functions", "datetime"),
)
def x_datetime_functions(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    ts = F.col("ts")
    return e.select(
        "event_id",
        F.year(ts).cast("int").alias("y"),
        F.quarter(ts).cast("int").alias("q"),
        F.month(ts).cast("int").alias("mo"),
        F.dayofmonth(ts).cast("int").alias("d"),
        F.hour(ts).cast("int").alias("h"),
        F.dayofyear(ts).cast("int").alias("doy"),
        F.last_day(ts).cast("string").alias("eom"),
        F.datediff(ts.cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_since"),
    ).orderBy("event_id")


@register(
    "x_math_functions",
    oracle=(
        "SELECT event_id, abs(event_id % 7 - 3) AS a, "
        "CAST(ceil(value) AS BIGINT) AS c, "
        "CAST(floor(value) AS BIGINT) AS f, "
        "CAST(round(value * 100) AS BIGINT) AS r2, "
        "event_id % 7 AS md, "
        "CAST(sign(value - 100) AS INT) AS sg, "
        "CAST(power(event_id % 5, 3) AS BIGINT) AS pw, "
        "CAST(sqrt(CAST((event_id % 10) * (event_id % 10) AS DOUBLE)) "
        "AS BIGINT) AS sq, "
        "greatest(event_id % 7, event_id % 5) AS gr, "
        "least(event_id % 7, event_id % 5) AS ls, "
        "((event_id % 16) & 5) AS band, ((event_id % 16) | 5) AS bor, "
        "xor(event_id % 16, 5) AS bxor, ((event_id % 16) << 2) AS bshl "
        "FROM events ORDER BY event_id"
    ),
    doc=(
        "Math + bitwise pack: abs/ceil/floor/round/mod/sign/power/"
        "sqrt/greatest/least and &,|,xor,<< — integer-exact "
        "spellings throughout (round via the hundredths contract, "
        "sqrt over perfect squares, power over small ints) so both "
        "engines agree bit-for-bit. All codegen, single scan."
    ),
    tags=("functions", "math"),
)
def x_math_functions(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    eid = F.col("event_id")
    v = F.col("value")
    m16 = eid % 16
    return e.select(
        "event_id",
        F.abs(eid % 7 - 3).alias("a"),
        F.ceil(v).cast("bigint").alias("c"),
        F.floor(v).cast("bigint").alias("f"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("r2"),
        (eid % 7).alias("md"),
        F.signum(v - 100).cast("int").alias("sg"),
        F.pow(eid % 5, 3).cast("bigint").alias("pw"),
        F.sqrt(((eid % 10) * (eid % 10)).cast("double"))
        .cast("bigint")
        .alias("sq"),
        F.greatest(eid % 7, eid % 5).alias("gr"),
        F.least(eid % 7, eid % 5).alias("ls"),
        m16.bitwiseAND(F.lit(5)).alias("band"),
        m16.bitwiseOR(F.lit(5)).alias("bor"),
        m16.bitwiseXOR(F.lit(5)).alias("bxor"),
        F.shiftleft(m16, 2).alias("bshl"),
    ).orderBy("event_id")


@register(
    "x_regexp_functions",
    oracle=(
        "SELECT doc_id, regexp_extract(text, '([a-z]+)', 1) AS first_word, "
        "regexp_replace(text, '[aeiou]', '*', 'g') AS starred, "
        "regexp_matches(text, '[0-9]') AS has_digit, "
        "len(regexp_split_to_array(text, '\\s+')) AS n_tokens "
        "FROM documents ORDER BY doc_id"
    ),
    doc=(
        "Regexp pack: extract/replace-all/match/split — the "
        "schema-imposing middleware primitives (T4/T6) for text "
        "routes, and the tokenizer core of the text-analysis family. "
        "DuckDB needs the 'g' flag to match Spark's replace-all "
        "semantics; patterns stay in the RE2∩Java-regex common "
        "subset. Single scan, codegen."
    ),
    tags=("functions", "regexp", "text"),
)
def x_regexp_functions(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_extract(t, "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace(t, "[aeiou]", "*").alias("starred"),
        t.rlike("[0-9]").alias("has_digit"),
        F.size(F.split(t, r"\s+")).cast("bigint").alias("n_tokens"),
    ).orderBy("doc_id")

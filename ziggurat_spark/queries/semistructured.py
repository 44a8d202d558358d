"""Semi-structured & reshaping pack: map and struct construction/
extraction/serialization, interval arithmetic, and wide→long unpivot.

These are the column shapes the middleware layer produces — proto
messages become structs, repeated k/v pairs become maps (SURVEY §1.1:
``google.protobuf.Struct`` fields are exactly this), and metric
tallies get reshaped long for sinks. Everything is a single-scan
codegen projection (unpivot adds an Expand node: k output rows per
input row, still narrow and shuffle-free before the final sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


@register(
    "x_map_struct_functions",
    oracle=(
        "SELECT event_id, "
        "map(['t','id'], [event_type, CAST(event_id AS VARCHAR)])['t'][1] "
        "AS from_map, "
        "to_json(struct_pack(t := event_type, v := CAST(round(value * 100) "
        "AS BIGINT))) AS js, "
        "CAST(cardinality(map(['t','id'], "
        "[event_type, CAST(event_id AS VARCHAR)])) AS INT) AS map_n "
        "FROM events ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Map + struct surface: build a map, extract by key, build a "
        "struct and serialize to JSON (identical compact spelling on "
        "both engines), count map entries — the columnar form of the "
        "protobuf Struct flattener (T5, middleware/default.clj:9-34): "
        "dynamic k/v payloads stay typed columns instead of Python "
        "dicts. Pure projection in one codegen span."
    ),
    tags=("functions", "map", "struct", "json"),
)
def x_map_struct_functions(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    m = F.map_from_arrays(
        F.array(F.lit("t"), F.lit("id")),
        F.array(F.col("event_type"), F.col("event_id").cast("string")),
    )
    st = F.struct(
        F.col("event_type").alias("t"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    )
    return (
        e.select(
            "event_id",
            m.getItem("t").alias("from_map"),
            F.to_json(st).alias("js"),
            F.size(m).cast("int").alias("map_n"),
        )
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "x_interval_arithmetic",
    oracle=(
        "SELECT event_id, "
        "CAST(ts + INTERVAL 90 MINUTE AS VARCHAR) AS plus90m, "
        "CAST(ts - INTERVAL 3 DAY AS VARCHAR) AS minus3d, "
        "CAST(date_trunc('hour', ts) + INTERVAL 30 MINUTE AS VARCHAR) "
        "AS half_past, "
        "CAST(date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts) "
        "AS BIGINT) AS mins_since "
        "FROM events ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Interval arithmetic: timestamp ± INTERVAL, truncate-then-"
        "offset, and minute deltas against a literal epoch — the "
        "building blocks of backoff horizons (R3: next_attempt_at = "
        "now + interval) and the staleness cutoff (T2), spelled "
        "without wall-clock so the oracle hash is stable. Timestamps "
        "emitted as ISO strings (FIXTURES §3 contract)."
    ),
    tags=("functions", "datetime", "interval"),
)
def x_interval_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    ts = F.col("ts")
    return (
        e.select(
            "event_id",
            (ts + F.expr("INTERVAL 90 MINUTE")).cast("string").alias("plus90m"),
            (ts - F.expr("INTERVAL 3 DAY")).cast("string").alias("minus3d"),
            (F.date_trunc("hour", ts) + F.expr("INTERVAL 30 MINUTE"))
            .cast("string")
            .alias("half_past"),
            (
                (ts.cast("long") - F.lit("2024-01-01 00:00:00").cast("timestamp").cast("long"))
                / 60
            )
            .cast("bigint")
            .alias("mins_since"),
        )
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "x_unpivot",
    oracle=(
        "SELECT l_orderkey, l_linenumber, measure, v100 FROM ("
        "SELECT l_orderkey, l_linenumber, 'price' AS measure, "
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS v100 FROM lineitem "
        "UNION ALL "
        "SELECT l_orderkey, l_linenumber, 'qty' AS measure, "
        "CAST(round(l_quantity * 100) AS BIGINT) AS v100 FROM lineitem "
        "UNION ALL "
        "SELECT l_orderkey, l_linenumber, 'tax' AS measure, "
        "CAST(round(l_tax * 100) AS BIGINT) AS v100 FROM lineitem) u "
        "ORDER BY l_orderkey, l_linenumber, measure LIMIT 20000"
    ),
    doc=(
        "Wide→long unpivot (melt): three lineitem measures become "
        "(measure, value) rows — the inverse of x_pivot_event_counts "
        "and the shape metric sinks want (one row per counter, "
        "metrics.clj:82-111). Spark's unpivot is a single Expand "
        "node (3 output rows per input, one scan — NOT three scans "
        "like the oracle's UNION ALL spelling); the plan-quality "
        "suite pins exactly one Expand and one scan. Values in exact "
        "integer hundredths."
    ),
    tags=("functions", "reshape"),
)
def x_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("price"),
        F.expr("CAST(round(l_quantity * 100) AS BIGINT)").alias("qty"),
        F.expr("CAST(round(l_tax * 100) AS BIGINT)").alias("tax"),
    )
    return (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["price", "qty", "tax"],
            "measure",
            "v100",
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
        .limit(20000)
    )


@register(
    "x_variant_shred",
    oracle=(
        "SELECT event_id, event_type AS type, "
        "CAST(round(value * 100) AS BIGINT) AS v100, "
        "user_id AS id0, CAST(NULL AS BIGINT) AS missing "
        "FROM events ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Spark 4 VARIANT round-trip: each event is serialized to a "
        "JSON document (to_json over a struct), parsed into the "
        "binary VARIANT type (parse_json), then shredded back out "
        "with typed path extraction — variant_get for scalars and "
        "array elements, try_variant_get for an absent path (NULL, "
        "not an error). The oracle is the identity: extraction must "
        "return exactly the columns the document was built from. "
        "VARIANT is the idiomatic-Spark replacement for ziggurat's "
        "schemaless middleware payloads (google.protobuf.Struct / "
        "arbitrary JSON, middleware/default.clj:9-34): bytes in, "
        "lazily-typed paths out, no schema declared up front. "
        "Single-scan codegen projection; the binary encoding keeps "
        "documents compact through any shuffle at 100 TB."
    ),
    tags=("semistructured", "variant"),
)
def x_variant_shred(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.col("event_type").alias("type"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
            F.array("user_id", "event_id").alias("ids"),
        )
    )
    v = e.select("event_id", F.parse_json(doc).alias("v"))
    return (
        v.select(
            "event_id",
            F.variant_get("v", "$.type", "string").alias("type"),
            F.variant_get("v", "$.v100", "long").alias("v100"),
            F.variant_get("v", "$.ids[0]", "long").alias("id0"),
            F.try_variant_get("v", "$.missing", "long").alias("missing"),
        )
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "x_union_by_name",
    oracle=(
        "WITH u AS ("
        "SELECT event_id, event_type, "
        "CAST(round(value * 100) AS BIGINT) AS v100, NULL AS user_id "
        "FROM events WHERE event_type = 'click' "
        "UNION ALL BY NAME "
        "SELECT event_id, user_id FROM events WHERE event_type = 'view') "
        "SELECT coalesce(event_type, '<none>') AS src_type, "
        "count(*) AS n, count(v100) AS n_v100, count(user_id) AS n_uid, "
        "CAST(sum(v100) AS BIGINT) AS sv100 "
        "FROM u GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "Schema-evolution union: two route outputs with different "
        "column sets merge via unionByName(allowMissingColumns=True) "
        "≡ DuckDB UNION ALL BY NAME — absent columns null-fill "
        "instead of erroring or misaligning by position. This is "
        "how an engine ingests a topic whose producers upgraded "
        "their schema mid-stream (ziggurat's per-route serde "
        "evolution; doc/middleware.md) — and how a 100 TB lakehouse "
        "unions a year of drifting parquet. Pure union + "
        "hash-agg: one shuffle of 3-column partials."
    ),
    tags=("setops", "schema-evolution"),
)
def x_union_by_name(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id",
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
    )
    views = e.where(F.col("event_type") == "view").select(
        "event_id", "user_id"
    )
    u = clicks.unionByName(views, allowMissingColumns=True)
    return (
        u.groupBy(
            F.coalesce("event_type", F.lit("<none>")).alias("src_type")
        )
        .agg(
            F.count("*").alias("n"),
            F.count("v100").alias("n_v100"),
            F.count("user_id").alias("n_uid"),
            F.sum("v100").alias("sv100"),
        )
        .orderBy("src_type")
    )


@register(
    "x_generator_null_semantics",
    oracle=(
        "WITH s AS (SELECT user_id, "
        "coalesce(list_sort(list_distinct(list(event_type) "
        "FILTER (value > 400))), []) AS arr FROM events GROUP BY user_id), "
        "x AS (SELECT s.user_id, u.x FROM s LEFT JOIN LATERAL "
        "(SELECT unnest(arr) AS x) u ON true) "
        "SELECT user_id, count(*) AS n_rows_outer, count(x) AS n_elems, "
        "coalesce(string_agg(x, ',' ORDER BY x), '') AS elems "
        "FROM x GROUP BY user_id ORDER BY user_id"
    ),
    doc=(
        "Generator NULL semantics: explode_outer preserves a row "
        "(with NULL element) for empty/NULL arrays where plain "
        "explode silently drops the parent row — the difference "
        "between 'users with no rare events vanish from the report' "
        "and 'they appear with zero'. DuckDB spells the same "
        "preservation as LEFT JOIN LATERAL unnest. Graded per user: "
        "outer row count (=max(1, elems)), element count, and the "
        "sorted element list. One hash-agg + a Generate node + one "
        "re-agg; the arrays are bounded by the 5-type domain."
    ),
    tags=("semistructured", "generator"),
)
def x_generator_null_semantics(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    s = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_set(F.when(F.col("value") > 400, F.col("event_type")))
        ).alias("arr")
    )
    x = s.select("user_id", F.explode_outer("arr").alias("x"))
    return (
        x.groupBy("user_id")
        .agg(
            F.count("*").alias("n_rows_outer"),
            F.count("x").alias("n_elems"),
            F.array_join(F.array_sort(F.collect_list("x")), ",").alias(
                "elems"
            ),
        )
        .orderBy("user_id")
    )

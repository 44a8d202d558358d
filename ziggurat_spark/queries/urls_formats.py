"""Fourth function-surface pack: URL decomposition, printf-style
formatting, array set algebra, and cross-join grid densification
(SURVEY §2.2 "Registered beyond Z01–Z28").

Reference tie-in: ziggurat's user surface is string/byte payloads
with per-route formatting and a declared route×channel topology
(`config.test.edn`, validated `init.clj:202-224`); an engine with
"the same capabilities" needs the everyday string/URL/format
functions those handlers would otherwise hand-roll, and the grid
query is the declared-topology × observed-traffic audit every
ziggurat operator runs in their head ("which route/channel pairs are
actually getting messages?").

All four stay JVM-side: pure codegen'd expressions over one scan, or
(grid) a 15-row broadcast join. Nothing here shuffles more than the
final ORDER BY at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


@register(
    "x_url_functions",
    oracle=(
        "WITH u AS (SELECT doc_id, 'https://' || lang || '.example.org/' "
        "|| source || '/' || CAST(doc_id AS VARCHAR) || '?page=' "
        "|| CAST(doc_id % 10 AS VARCHAR) || '&ref=' || lang AS url "
        "FROM documents) "
        "SELECT doc_id, "
        "regexp_extract(url, '^([a-z]+)://', 1) AS proto, "
        "regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host, "
        "regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1) AS path, "
        "regexp_extract(url, '[?&]page=([^&]*)', 1) AS page "
        "FROM u ORDER BY doc_id"
    ),
    doc=(
        "URL decomposition: Spark's dedicated parse_url "
        "(PROTOCOL/HOST/PATH/QUERY-with-key) against the oracle's "
        "regexp spelling of the same grammar — the log-analytics "
        "staple (every clickstream pipeline splits URLs before "
        "grouping by host/path). URLs are synthesized "
        "deterministically from document columns so both engines see "
        "identical inputs. Pure per-row expressions inside "
        "whole-stage codegen; one scan, no shuffle but the ORDER BY."
    ),
    tags=("functions", "strings"),
)
def x_url_functions(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("lang"),
        F.lit(".example.org/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?page="),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("&ref="),
        F.col("lang"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page"),
    ).orderBy("doc_id")


@register(
    "x_format_functions",
    oracle=(
        "SELECT event_id, "
        "printf('%05d|%s|%+08d', event_id % 100000, event_type, "
        "CAST(round(value * 100) AS BIGINT)) AS line, "
        "strftime(ts, '%Y-%m-%d %H:%M') AS minute_str, "
        "lpad(CAST(event_id AS VARCHAR), 12, '0') AS padded "
        "FROM events ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "printf-style formatting (Spark format_string ≡ DuckDB "
        "printf: zero-pad, string, explicit-sign pad) plus "
        "pattern-based timestamp rendering (date_format ≡ strftime) "
        "— the sink-side serialization surface (ziggurat routes "
        "format payloads for downstream topics; K1/K2's string "
        "rendering). Codegen'd per-row expressions; no shuffle but "
        "the global sort-limit, which AQE executes as a TakeOrdered "
        "(top-k per partition, k-merge on one reducer) at any scale."
    ),
    tags=("functions", "strings"),
)
def x_format_functions(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return (
        e.select(
            "event_id",
            F.format_string(
                "%05d|%s|%+08d",
                F.col("event_id") % 100000,
                F.col("event_type"),
                F.expr("CAST(round(value * 100) AS BIGINT)"),
            ).alias("line"),
            F.date_format("ts", "yyyy-MM-dd HH:mm").alias("minute_str"),
            F.lpad(F.col("event_id").cast("string"), 12, "0").alias("padded"),
        )
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "x_array_set_ops",
    oracle=(
        "WITH s AS (SELECT user_id, "
        "coalesce(list_sort(list_distinct(list(event_type) "
        "FILTER (value > 0.3))), []) AS hi, "
        "coalesce(list_sort(list_distinct(list(event_type) "
        "FILTER (value <= 0.3))), []) AS lo "
        "FROM events GROUP BY user_id) "
        "SELECT user_id, "
        "coalesce(array_to_string(list_filter(hi, "
        "x -> list_contains(lo, x)), ','), '') AS both_bands, "
        "coalesce(array_to_string(list_filter(hi, "
        "x -> NOT list_contains(lo, x)), ','), '') AS hi_only, "
        "coalesce(array_to_string(list_sort(list_distinct("
        "list_concat(hi, lo))), ','), '') AS any_band "
        "FROM s ORDER BY user_id"
    ),
    doc=(
        "Array set algebra: per-user sorted-distinct event-type sets "
        "for two value bands, then array_intersect / array_except / "
        "array_union (DuckDB: list_filter+list_contains, preserving "
        "the sorted left-operand order Spark's set ops guarantee). "
        "Rendered via array_join so both engines hash one string. "
        "This is the channel-membership algebra (R8): which routes a "
        "user hit in both/only-one band. One hash-aggregate shuffle "
        "on user_id with map-side partial collect_sets; per-group "
        "state is bounded by the 5-type domain, not row count — "
        "identical shape at 100 TB."
    ),
    tags=("functions", "arrays"),
)
def x_array_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    s = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_set(F.when(F.col("value") > 0.3, F.col("event_type")))
        ).alias("hi"),
        F.array_sort(
            F.collect_set(F.when(F.col("value") <= 0.3, F.col("event_type")))
        ).alias("lo"),
    )
    return s.select(
        "user_id",
        F.array_join(F.array_intersect("hi", "lo"), ",").alias("both_bands"),
        F.array_join(F.array_except("hi", "lo"), ",").alias("hi_only"),
        F.array_join(F.array_sort(F.array_union("hi", "lo")), ",").alias(
            "any_band"
        ),
    ).orderBy("user_id")


@register(
    "x_topology_grid",
    oracle=(
        "SELECT t.event_type, c.ch, count(e.event_id) AS n "
        "FROM (SELECT DISTINCT event_type FROM events) t "
        "CROSS JOIN (SELECT unnest([0, 1, 2]) AS ch) c "
        "LEFT JOIN events e ON e.event_type = t.event_type "
        "AND e.event_id % 3 = c.ch "
        "GROUP BY t.event_type, c.ch ORDER BY t.event_type, c.ch"
    ),
    doc=(
        "Declared-topology audit: CROSS JOIN builds the dense "
        "route × channel grid (ziggurat validates declared channels "
        "against config at startup, init.clj:202-224; R8's "
        "route/channel product), LEFT JOIN + count fills observed "
        "traffic — zero-traffic pairs surface as n=0 instead of "
        "silently missing, which is the point of densifying. "
        "Aggregate-then-densify ordering: events collapse to ≤15 "
        "(type, channel) counts FIRST (hash-agg with map-side "
        "partials — the only full-data pass), and the outer join "
        "runs between two broadcast-sized relations. The naive "
        "spelling (grid LEFT JOIN raw events) can't broadcast its "
        "left outer side and would shuffle all events; this plan is "
        "one scan + tiny agg + broadcast join at 100 TB."
    ),
    tags=("joins", "routing"),
)
def x_topology_grid(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    counts = (
        e.groupBy("event_type", (F.col("event_id") % 3).alias("ch"))
        .agg(F.count("*").alias("cnt"))
        # materialize the ≤15-row result once: the type dimension
        # below reuses it, and WITHOUT this Spark would duplicate
        # the whole subtree — scanning events twice
        .localCheckpoint(eager=False)  # lazy; 1st pass materializes
    )
    types = counts.select("event_type").distinct()
    channels = spark.range(3).select(F.col("id").alias("ch"))
    grid = types.crossJoin(channels)
    return (
        grid.join(F.broadcast(counts), ["event_type", "ch"], "left")
        .select(
            "event_type",
            "ch",
            F.coalesce("cnt", F.lit(0)).alias("n"),
        )
        .orderBy("event_type", "ch")
    )

"""Aggregation surface (Z16–Z19).

The reference's only aggregations are metric counters/histograms
(metrics.clj:82-128, batch tallies consumer_handler.clj:59-65); the
engine ships a full aggregation surface because that's the query
capability the north star requires.

Float-determinism note: summing doubles is order-dependent, and
Spark's partial aggregation order differs run-to-run and from
DuckDB's. Every oracle-checked float aggregate therefore sums EXACT
INTEGER CENTS (``value`` has 2 decimal digits by construction) and
converts to double afterwards — integer aggregation is associative/
commutative so both engines produce bit-identical results, and the
post-arithmetic is a fixed IEEE expression tree. This costs nothing
at scale: it's still a single map-side-combined groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


def cents(col: Column) -> Column:
    """Exact integer cents of a 2-decimal double (both engines round
    half away from zero for positive doubles; value*100 is within
    1e-9 of an integer so the rounding never sits on a boundary)."""
    return F.round(col * 100).cast("long")


@register(
    "z16_grouped_counters",
    oracle=(
        "SELECT event_type, count(*) AS n, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS sv, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 / count(*) AS av, "
        "min(value) AS mn, max(value) AS mx "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    doc=(
        "Grouped success/skip/retry-style tallies "
        "(consumer_handler.clj:59-65) + min/max/avg. Map-side partial "
        "aggregation; one shuffle on event_type."
    ),
    tags=("agg",),
)
def z16(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    sum_cents = F.sum(cents(F.col("value")))
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            (sum_cents.cast("double") / 100).alias("sv"),
            (sum_cents.cast("double") / 100 / F.count("*")).alias("av"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .orderBy("event_type")
    )


@register(
    "z17_count_distinct",
    oracle="SELECT count(DISTINCT user_id) AS u FROM events",
    doc=(
        "Exact distinct (two-phase: partial distinct per partition, "
        "then merge). The streaming/100TB variant is "
        "approx_count_distinct (HLL sketch, no second shuffle) — "
        "checked separately as a tolerance test, sketches aren't "
        "cross-engine comparable."
    ),
    tags=("agg",),
)
def z17(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return e.agg(F.countDistinct("user_id").alias("u"))


@register(
    "z18_rollup",
    oracle=(
        "SELECT coalesce(event_type, '<all>') AS event_type, "
        "coalesce(CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR), '<all>') AS d, "
        "count(*) AS n FROM events "
        "GROUP BY ROLLUP (event_type, CAST(date_trunc('day', ts) AS DATE)) "
        "ORDER BY 1, 2, 3"
    ),
    doc=(
        "Hierarchical rollup (grand total + per-type + per-type-day). "
        "Grouping-null keys are rewritten to a '<all>' sentinel so the "
        "result is null-free (engines spell null dates differently)."
    ),
    tags=("agg",),
)
def z18(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").withColumn(
        "d0", F.date_trunc("day", "ts").cast("date")
    )
    return (
        e.rollup("event_type", "d0")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce(F.col("d0").cast("string"), F.lit("<all>")).alias("d"),
            "n",
        )
        .orderBy("event_type", "d", "n")
    )


@register(
    "z19_histogram_buckets",
    oracle=(
        "SELECT CAST(floor(value / 10) AS INT) AS bucket, count(*) AS n "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "Histogram bucketing — the batch analogue of the metrics "
        "histograms (metrics.clj:117-128)."
    ),
    tags=("agg",),
)
def z19(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(F.floor(F.col("value") / 10).cast("int").alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


@register(
    "x_grouping_sets",
    oracle=(
        "SELECT coalesce(event_type, '<all>') AS event_type, "
        "coalesce(CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR), "
        "'<all>') AS d, count(*) AS n, CAST(sum(CAST(round(value * 100) AS "
        "BIGINT)) AS BIGINT) AS sv100 FROM events "
        "GROUP BY GROUPING SETS ((event_type), "
        "(CAST(date_trunc('day', ts) AS DATE)), ()) "
        "ORDER BY 1, 2, 3"
    ),
    doc=(
        "Arbitrary GROUPING SETS (per-type, per-day, grand total — "
        "NOT a rollup hierarchy). Spark plans one Expand node feeding "
        "one partial-agg shuffle: each input row is replicated once "
        "per grouping set map-side, so the shuffle carries "
        "sets × groups rows, not sets × input. value summed in exact "
        "integer hundredths."
    ),
    tags=("agg",),
)
def x_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("d0"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
    )
    e.createOrReplaceTempView("_gs_events")
    return spark.sql(
        "SELECT coalesce(event_type, '<all>') AS event_type, "
        "coalesce(CAST(d0 AS STRING), '<all>') AS d, "
        "count(*) AS n, sum(v100) AS sv100 "
        "FROM _gs_events "
        "GROUP BY GROUPING SETS ((event_type), (d0), ()) "
        "ORDER BY 1, 2, 3"
    )


@register(
    "x_variance_exact",
    oracle=(
        "WITH s AS (SELECT event_type, count(*) AS n, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DECIMAL(38,0)) "
        "AS s1, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT) * "
        "CAST(round(value * 100) AS BIGINT)) AS DECIMAL(38,0)) AS s2 "
        "FROM events GROUP BY event_type) "
        "SELECT event_type, n, "
        "CAST(n * s2 - s1 * s1 AS DOUBLE) / "
        "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 10000.0) AS variance "
        "FROM s ORDER BY event_type"
    ),
    doc=(
        "Population variance computed EXACTLY: n·Σx² − (Σx)² over "
        "scaled-integer sums (DECIMAL(38,0) — overflow-safe at any "
        "corpus size), with ONE float division at the end. The "
        "built-in var_pop is a float fold whose result depends on "
        "partition order — unusable for cross-engine hash checks and "
        "drift-prone at 100 TB; this spelling is associative, "
        "commutative, and bit-stable under any partitioning."
    ),
    tags=("agg", "stats"),
)
def x_variance_exact(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    v = F.expr("CAST(round(value * 100) AS BIGINT)")
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).cast("decimal(38,0)").alias("s1"),
        F.sum(v * v).cast("decimal(38,0)").alias("s2"),
    )
    return s.select(
        "event_type",
        "n",
        (
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
                "double"
            )
            / (F.col("n").cast("double") * F.col("n").cast("double") * 10000.0)
        ).alias("variance"),
    ).orderBy("event_type")

"""Skew-toolkit queries: the salted rewrites (functions/skew.py) in
the GRADED surface, oracle-checked against the plain un-salted SQL —
proving the rewrites are semantics-preserving, not just unit-tested.

Hash-exactness under re-ordered execution: float sums are computed
in exact scaled-integer form (salting changes the addition order, so
double sums would drift in the last bits); count/min/max are
order-insensitive by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.functions.skew import salted_agg, salted_join
from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


@register(
    "x_salted_agg",
    oracle=(
        "SELECT event_type, count(*) AS n, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv100, "
        "CAST(min(user_id) AS BIGINT) AS mn_user, "
        "CAST(max(user_id) AS BIGINT) AS mx_user "
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    doc=(
        "Two-phase salted aggregation (functions/skew.py::salted_agg, "
        "16 salt buckets): partial agg on (key, salt) fans a hot "
        "group over 16 reducers; the final agg merges 16 partials per "
        "group. Identical results to the plain GROUP BY oracle — the "
        "algebraic aggregates commute and the sum runs in exact "
        "integers. The rewrite for when AQE's skew handling can't "
        "help (single mega-group under sort-fallback or streaming "
        "state)."
    ),
    tags=("skew", "agg"),
)
def x_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").withColumn(
        "v100", F.expr("CAST(round(value * 100) AS BIGINT)")
    )
    out = salted_agg(
        e,
        keys=["event_type"],
        aggs={
            "n": ("count", None),
            "sv100": ("sum", "v100"),
            "mn_user": ("min", "user_id"),
            "mx_user": ("max", "user_id"),
        },
        salt_buckets=16,
    )
    return out.orderBy("event_type")


@register(
    "x_salted_join",
    oracle=(
        "SELECT c.c_mktsegment, count(*) AS n, "
        "CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS total100 "
        "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
        "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"
    ),
    doc=(
        "Salted equi-join (functions/skew.py::salted_join, 16 salt "
        "buckets): the fact side gets a random salt, the dim side is "
        "exploded 16 ways, and the join key becomes (key, salt) — a "
        "hot customer key spreads over 16 reducers instead of one. "
        "Aggregated to segment totals and checked against the plain "
        "join oracle: the salt provably changes only placement, never "
        "results."
    ),
    tags=("skew", "join"),
)
def x_salted_join(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    c = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    joined = salted_join(o, c, on="custkey", salt_buckets=16)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
                "total100"
            ),
        )
        .orderBy("c_mktsegment")
    )

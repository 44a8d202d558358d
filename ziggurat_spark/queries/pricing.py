"""TPC-H-shaped heavyweight analytics (capability superset).

The reference computes nothing like these (its aggregations are
metric counters — SURVEY §2.1); they exist because the north star is
query capability at 100 TB, and these two shapes — a full-scan
multi-aggregate rollup and a 3-table join + group + top-k — are the
plans whose scaling behavior matters most: one shuffle each on the
group keys, dim sides broadcast, filters on the scan.

Float parity story (see queries/aggs.py): money columns have 2
decimal digits by construction, so ``extendedprice * (1-discount)``
is EXACTLY a 4-decimal number and ``* (1+tax)`` a 6-decimal one.
Summing their scaled-integer forms as DECIMAL(38,0) is exact,
associative and overflow-safe at any scale (an int64 sum of
6-decimal cents overflows around 6 billion rows — DECIMAL(38) is
the 100 TB spelling on both engines); the final division is a fixed
IEEE expression tree, so Spark and DuckDB hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table

_CUTOFF = "1998-09-02"
_Q3_DATE = "1997-06-01"


def _c2(col: str) -> str:
    """SQL: exact integer hundredths of a 2-decimal double."""
    return f"CAST(round({col} * 100) AS BIGINT)"


#: scaled-integer forms (shared spelling, valid on both engines)
_DISC_PRICE = (
    f"CAST({_c2('l_extendedprice')} * {_c2('(1 - l_discount)')} "
    "AS DECIMAL(38,0))"
)
_CHARGE = (
    f"CAST({_c2('l_extendedprice')} * {_c2('(1 - l_discount)')} "
    f"* {_c2('(1 + l_tax)')} AS DECIMAL(38,0))"
)


@register(
    "x_pricing_summary",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        f"CAST(sum({_c2('l_quantity')}) AS DOUBLE) / 100 AS sum_qty, "
        f"CAST(sum({_c2('l_extendedprice')}) AS DOUBLE) / 100 AS sum_base_price, "
        f"CAST(sum({_DISC_PRICE}) AS DOUBLE) / 10000 AS sum_disc_price, "
        f"CAST(sum({_CHARGE}) AS DOUBLE) / 1000000 AS sum_charge, "
        f"CAST(sum({_c2('l_quantity')}) AS DOUBLE) / 100 / count(*) AS avg_qty, "
        f"CAST(sum({_c2('l_discount')}) AS DOUBLE) / 100 / count(*) AS avg_disc, "
        "count(*) AS count_order "
        f"FROM lineitem WHERE l_shipdate <= TIMESTAMP '{_CUTOFF} 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"
    ),
    doc=(
        "TPC-H Q1 shape: full lineitem scan (shipdate predicate "
        "pushed), 7 aggregates in one map-side-combined groupBy, one "
        "shuffle on (returnflag, linestatus). Money sums are exact "
        "scaled-integer DECIMAL(38,0) — see module docstring."
    ),
    tags=("pricing", "agg"),
)
def x_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(f"{_CUTOFF} 00:00:00").cast("timestamp")
    )
    sum_qty = F.sum(F.expr(_c2("l_quantity")))
    sum_disc = F.sum(F.expr(_c2("l_discount")))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            (sum_qty.cast("double") / 100).alias("sum_qty"),
            (F.sum(F.expr(_c2("l_extendedprice"))).cast("double") / 100).alias(
                "sum_base_price"
            ),
            (F.sum(F.expr(_DISC_PRICE)).cast("double") / 10000).alias(
                "sum_disc_price"
            ),
            (F.sum(F.expr(_CHARGE)).cast("double") / 1000000).alias(
                "sum_charge"
            ),
            (sum_qty.cast("double") / 100 / F.count("*")).alias("avg_qty"),
            (sum_disc.cast("double") / 100 / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "x_shipping_priority",
    oracle=(
        "SELECT l.l_orderkey, "
        f"CAST(sum({_DISC_PRICE.replace('l_', 'l.l_')}) AS DOUBLE) / 10000 "
        "AS revenue, o.o_orderdate, o.o_orderpriority "
        "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        f"AND o.o_orderdate < TIMESTAMP '{_Q3_DATE} 00:00:00' "
        f"AND l.l_shipdate > TIMESTAMP '{_Q3_DATE} 00:00:00' "
        "GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
    doc=(
        "TPC-H Q3 shape: filtered customer (dim, broadcast) joins "
        "orders joins lineitem (fact), revenue per order, top-10. "
        "One shuffle on the join key and one on the group key; both "
        "date filters push to their scans."
    ),
    tags=("pricing", "join", "topk"),
)
def x_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    cut = F.lit(f"{_Q3_DATE} 00:00:00").cast("timestamp")
    c = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf, "orders").filter(F.col("o_orderdate") < cut)
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > cut)
    disc_price = F.expr(_DISC_PRICE)
    return (
        li.join(
            o.join(c, o.o_custkey == c.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(disc_price).cast("double") / 10000).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )

"""More TPC-H-shaped analytics (capability superset, adapted to the
driver schema — no partsupp/shipmode/commitdate columns exist, so
Q12/Q16/Q20/Q21 shapes are re-expressed over available columns).

The reference computes nothing like these (its aggregations are
metric counters — SURVEY §2.1); they exist because the north star is
query capability at 100 TB. Each query's docstring states the scale
shape: what shuffles, what broadcasts, what stays on the scan.

Float parity (see queries/pricing.py): all money sums use the exact
scaled-integer DECIMAL(38,0) spelling; divisions happen once, at the
end, as a fixed IEEE expression identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


def _c2(col: str) -> str:
    """SQL: exact integer hundredths of a 2-decimal double."""
    return f"CAST(round({col} * 100) AS BIGINT)"


_DISC_PRICE = (
    f"CAST({_c2('l_extendedprice')} * {_c2('(1 - l_discount)')} "
    "AS DECIMAL(38,0))"
)


@register(
    "x_revenue_forecast",
    oracle=(
        "SELECT CAST(sum("
        f"CAST({_c2('l_extendedprice')} * {_c2('l_discount')} "
        "AS DECIMAL(38,0))) AS DOUBLE) / 10000 AS revenue "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00' "
        f"AND {_c2('l_discount')} BETWEEN 5 AND 7 "
        "AND l_quantity < 24"
    ),
    doc=(
        "TPC-H Q6 shape: single scan, every predicate pushed to "
        "parquet (row-group min/max skips whole chunks of the 100 TB "
        "fact table), one partial-agg shuffle of exactly one row per "
        "partition. The cheapest possible plan for a selective "
        "full-table aggregate. Discount compared in exact integer "
        "hundredths so the boundary rows match DuckDB bit-for-bit."
    ),
    tags=("pricing", "agg", "pushdown"),
)
def x_revenue_forecast(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    rev = F.expr(
        f"CAST({_c2('l_extendedprice')} * {_c2('l_discount')} "
        "AS DECIMAL(38,0))"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.expr(f"{_c2('l_discount')} BETWEEN 5 AND 7")
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(rev).cast("double") / 10000).alias("revenue"))
    )


@register(
    "x_volume_shipping",
    oracle=(
        "SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation, "
        "CAST(year(l.l_shipdate) AS INT) AS l_year, "
        f"CAST(sum({_DISC_PRICE.replace('l_', 'l.l_')}) AS DOUBLE) / 10000 "
        "AS revenue "
        "FROM lineitem l "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        "JOIN nation n1 ON n1.n_nationkey = c.c_nationkey "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "JOIN nation n2 ON n2.n_nationkey = s.s_nationkey "
        "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
        "GROUP BY cust_nation, supp_nation, l_year "
        "ORDER BY cust_nation, supp_nation, l_year"
    ),
    doc=(
        "TPC-H Q7 shape: bilateral trade volume by year. Fact-fact "
        "join (lineitem ⋈ orders) is the only big shuffle; customer/"
        "supplier/nation are broadcast, and the nation-name filter "
        "semi-reduces both dim sides before the fact join. Group "
        "cardinality is years × 2 — the final agg shuffle is bytes."
    ),
    tags=("pricing", "join", "agg"),
)
def x_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    n1 = n.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = n.filter(F.col("n_name").isin("NATION_1", "NATION_2")).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust = c.join(F.broadcast(n1), c.c_nationkey == n1.c_nk)
    supp = s.join(F.broadcast(n2), s.s_nationkey == n2.s_nk)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg((F.sum(F.expr(_DISC_PRICE)).cast("double") / 10000).alias("revenue"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


@register(
    "x_conditional_agg",
    oracle=(
        "SELECT l.l_linestatus, "
        "CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
        "AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
        "GROUP BY l.l_linestatus ORDER BY l.l_linestatus"
    ),
    doc=(
        "TPC-H Q12 shape (shipmode → linestatus; no shipmode column "
        "in the driver schema): conditional aggregation over a "
        "fact-fact join. The shipdate filter reduces lineitem before "
        "the join; CASE WHEN counters are map-side-combined so the "
        "agg shuffle carries 2 rows × partitions."
    ),
    tags=("routing", "join", "agg"),
)
def x_conditional_agg(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "x_order_count_distribution",
    oracle=(
        "SELECT c_count, count(*) AS custdist FROM ("
        "SELECT c.c_custkey, count(o.o_orderkey) AS c_count "
        "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_custkey) "
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
    ),
    doc=(
        "TPC-H Q13 shape: two-level aggregation (orders per customer, "
        "then customers per order-count). First agg shuffles on "
        "custkey (same key as the join — Catalyst reuses the "
        "exchange); second input is one row per customer and the "
        "distribution output is tiny. The left join preserves "
        "zero-order customers as c_count = 0."
    ),
    tags=("join", "agg"),
)
def x_order_count_distribution(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").select("c_custkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "x_promo_effect",
    oracle=(
        "SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN "
        f"{_DISC_PRICE.replace('l_', 'l.l_')} ELSE 0 END) AS DOUBLE) "
        f"/ CAST(sum({_DISC_PRICE.replace('l_', 'l.l_')}) AS DOUBLE) "
        "AS promo_revenue "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00' "
        "AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'"
    ),
    doc=(
        "TPC-H Q14 shape: promo revenue share for one month. The "
        "month filter cuts lineitem to ~1/80th before the join; part "
        "is a broadcast dim, so the fact side never shuffles. Both "
        "sums are exact scaled integers; the single final division "
        "is the only float op, identical on both engines."
    ),
    tags=("pricing", "join", "agg"),
)
def x_promo_effect(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf, "part").select("p_partkey", "p_type")
    disc = F.expr(_DISC_PRICE)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0))
                ).cast("double")
                / F.sum(disc).cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "x_top_supplier",
    oracle=(
        "WITH revenue AS ("
        "SELECT l_suppkey AS supplier_no, "
        f"sum({_DISC_PRICE}) AS total_rev "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00' "
        "GROUP BY l_suppkey) "
        "SELECT s.s_suppkey, s.s_name, "
        "CAST(r.total_rev AS DOUBLE) / 10000 AS total_revenue "
        "FROM revenue r JOIN supplier s ON s.s_suppkey = r.supplier_no "
        "WHERE r.total_rev = (SELECT max(total_rev) FROM revenue) "
        "ORDER BY s.s_suppkey"
    ),
    doc=(
        "TPC-H Q15 shape: top supplier by quarterly revenue. The "
        "scalar-subquery max is computed as a 1-row aggregate and "
        "broadcast back over the per-supplier revenue table (never a "
        "global window — a single-partition sort over all suppliers "
        "would not survive 100 TB). Equality happens on the exact "
        "DECIMAL revenue, so ties are handled identically to DuckDB."
    ),
    tags=("pricing", "agg", "subquery"),
)
def x_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.expr(_DISC_PRICE)).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_rev == mx.max_rev)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_rev").cast("double") / 10000).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "x_small_qty_revenue",
    oracle=(
        "WITH li_b AS ("
        "SELECT l.* FROM lineitem l "
        "JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE p.p_brand = 'Brand#23'), "
        "pa AS ("
        f"SELECT l_partkey, sum({_c2('l_quantity')}) AS sq, "
        "count(*) AS cnt FROM li_b GROUP BY l_partkey) "
        f"SELECT CAST(sum({_c2('l.l_extendedprice')}) AS DOUBLE) / 100 / 7.0 "
        "AS avg_yearly "
        "FROM li_b l JOIN pa ON pa.l_partkey = l.l_partkey "
        f"WHERE {_c2('l.l_quantity')} * pa.cnt * 5 < pa.sq"
    ),
    doc=(
        "TPC-H Q17 shape: revenue of small-quantity orders (below "
        "20% of the part's average quantity). The correlated "
        "subquery becomes a grouped aggregate joined back on partkey "
        "— both sides shuffle on the same key once (Catalyst reuses "
        "the exchange). The avg comparison is done in cross-"
        "multiplied integer form (qty·cnt·5 < Σqty), exact on both "
        "engines with no float threshold."
    ),
    tags=("pricing", "join", "subquery"),
)
def x_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    p = (
        load_table(spark, sf, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load_table(spark, sf, "lineitem").join(
        p, F.col("l_partkey") == p.p_partkey
    )
    pa = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        F.sum(F.expr(_c2("l_quantity"))).alias("sq"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(pa, li.l_partkey == pa.pa_key)
        .filter(F.expr(_c2("l_quantity")) * F.col("cnt") * 5 < F.col("sq"))
        .agg(
            (
                F.sum(F.expr(_c2("l_extendedprice"))).cast("double") / 100 / 7.0
            ).alias("avg_yearly")
        )
    )


@register(
    "x_large_volume_customer",
    oracle=(
        "SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, "
        "o.o_totalprice, "
        f"CAST(sum({_c2('l.l_quantity')}) AS DOUBLE) / 100 AS total_qty "
        "FROM customer c "
        "JOIN orders o ON o.o_custkey = c.c_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderkey IN ("
        f"SELECT l_orderkey FROM lineitem GROUP BY l_orderkey "
        f"HAVING sum({_c2('l_quantity')}) > 25000) "
        "GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, "
        "o.o_totalprice "
        "ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100"
    ),
    doc=(
        "TPC-H Q18 shape: customers with orders above 250 total "
        "quantity. The HAVING subquery is a grouped aggregate on "
        "orderkey whose qualifying set is small — it semi-joins back "
        "into the fact join as a broadcast. Quantity threshold "
        "compared in exact hundredths."
    ),
    tags=("join", "agg", "subquery", "topk"),
)
def x_large_volume_customer(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.expr(_c2("l_quantity"))).alias("sq"))
        .filter(F.col("sq") > 25000)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        li.join(big, li.l_orderkey == big.big_key)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            (F.sum(F.expr(_c2("l_quantity"))).cast("double") / 100).alias(
                "total_qty"
            )
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "x_disjunctive_join",
    oracle=(
        f"SELECT CAST(sum({_DISC_PRICE.replace('l_', 'l.l_')}) AS DOUBLE) "
        "/ 10000 AS revenue "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11 "
        "AND p.p_size BETWEEN 1 AND 5) "
        "OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20 "
        "AND p.p_size BETWEEN 1 AND 10) "
        "OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30 "
        "AND p.p_size BETWEEN 1 AND 15)"
    ),
    doc=(
        "TPC-H Q19 shape: disjunction of conjunctive predicates over "
        "a fact-dim join. Catalyst extracts the common sub-"
        "predicates (p_size >= 1, quantity ranges) and pushes the "
        "p_brand IN (...) disjunction-union to the part scan; part "
        "is broadcast so the OR evaluates stream-side with zero fact "
        "shuffle."
    ),
    tags=("pricing", "join", "pushdown"),
)
def x_disjunctive_join(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return joined.filter(cond).agg(
        (F.sum(F.expr(_DISC_PRICE)).cast("double") / 10000).alias("revenue")
    )

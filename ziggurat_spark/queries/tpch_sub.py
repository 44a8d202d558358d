"""Subquery-heavy TPC-H shapes (Q2/Q8/Q9/Q11/Q16/Q20/Q21/Q22),
re-expressed over the driver schema (no partsupp/c_phone/
l_receiptdate columns exist — SURVEY §2.2 note; lineitem stands in
for partsupp as the part↔supplier association, s_acctbal for the
Q16 complaint filter, l_returnflag='R' for Q21's late-receipt flag,
and "no recent orders" for Q22's seven-year dormancy).

The reference computes nothing like these (its only aggregations are
metric counters — SURVEY §2.1 / metrics.clj:82-128); they exist
because the north star is full query capability at 100 TB. These
eight specifically exercise the subquery surface: correlated scalar
subqueries, scalar aggregates as thresholds, IN / NOT IN, and
EXISTS / NOT EXISTS — each decorrelated by hand into the join/agg
form Catalyst would produce, so the physical plan is explicit and
reviewable.

Float parity (see queries/pricing.py): money math is exact
scaled-integer DECIMAL(38,0); thresholds are cross-multiplied
integer comparisons (never float divisions); each query performs at
most one final division, as a fixed IEEE expression identical on
both engines.
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
    "x_min_cost_supplier",
    oracle=(
        "WITH ps AS ("
        f"SELECT l_partkey, l_suppkey, min({_c2('l_extendedprice')}) AS cost "
        "FROM lineitem GROUP BY l_partkey, l_suppkey), "
        "eligible AS ("
        "SELECT ps.l_partkey, ps.l_suppkey, ps.cost, s.s_name, n.n_name "
        "FROM ps JOIN supplier s ON s.s_suppkey = ps.l_suppkey "
        "JOIN nation n ON n.n_nationkey = s.s_nationkey "
        "JOIN region r ON r.r_regionkey = n.n_regionkey "
        "WHERE r.r_name = 'ASIA') "
        "SELECT p.p_partkey, p.p_brand, e.s_name, e.n_name AS nation, "
        "CAST(e.cost AS DOUBLE) / 100 AS cost "
        "FROM eligible e JOIN part p ON p.p_partkey = e.l_partkey "
        "WHERE p.p_size <= 15 "
        "AND e.cost = (SELECT min(e2.cost) FROM eligible e2 "
        "WHERE e2.l_partkey = e.l_partkey) "
        "ORDER BY p.p_partkey, e.s_name LIMIT 100"
    ),
    doc=(
        "TPC-H Q2 shape: cheapest regional supplier per part "
        "(lineitem min extendedprice stands in for ps_supplycost). "
        "The correlated min-cost subquery is decorrelated to a "
        "grouped aggregate joined back on partkey — same-key "
        "shuffle, Catalyst reuses the exchange. Supplier/nation/"
        "region and the size-filtered part are broadcast dims; the "
        "only big shuffle is the (partkey, suppkey) partial agg of "
        "the fact table, which AQE sizes at runtime."
    ),
    tags=("join", "subquery", "agg"),
)
def x_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.expr(_c2("l_extendedprice"))).alias("cost")
    )
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    asia_sup = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    eligible = ps.join(
        asia_sup, ps.l_suppkey == F.col("s_suppkey")
    ).select("l_partkey", "cost", "s_name", "n_name")
    min_cost = eligible.groupBy(F.col("l_partkey").alias("mc_key")).agg(
        F.min("cost").alias("min_cost")
    )
    p = (
        load_table(spark, sf, "part")
        .filter(F.col("p_size") <= 15)
        .select("p_partkey", "p_brand")
    )
    return (
        eligible.join(
            min_cost,
            (eligible.l_partkey == min_cost.mc_key)
            & (eligible.cost == min_cost.min_cost),
        )
        .join(p, eligible.l_partkey == p.p_partkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.col("n_name").alias("nation"),
            (F.col("cost").cast("double") / 100).alias("cost"),
        )
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


@register(
    "x_market_share",
    oracle=(
        "SELECT o_year, "
        "CAST(sum(CASE WHEN nation = 'NATION_3' THEN vol ELSE 0 END) "
        "AS DOUBLE) / CAST(sum(vol) AS DOUBLE) AS mkt_share "
        "FROM ("
        "SELECT CAST(year(o.o_orderdate) AS INT) AS o_year, "
        f"{_DISC_PRICE.replace('l_', 'l.l_')} AS vol, n2.n_name AS nation "
        "FROM lineitem l "
        "JOIN part p ON p.p_partkey = l.l_partkey "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        "JOIN nation n1 ON n1.n_nationkey = c.c_nationkey "
        "JOIN region r ON r.r_regionkey = n1.n_regionkey "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "JOIN nation n2 ON n2.n_nationkey = s.s_nationkey "
        "WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD' "
        "AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00') t "
        "GROUP BY o_year ORDER BY o_year"
    ),
    doc=(
        "TPC-H Q8 shape: national market share inside a region. "
        "Eight-table join where only lineitem ⋈ orders shuffles; "
        "part (type-filtered), customer→nation→region (region-"
        "filtered semi-reduction), supplier→nation are all broadcast "
        "dims. Numerator and denominator are exact DECIMAL sums; "
        "one final double division per year row."
    ),
    tags=("pricing", "join", "agg"),
)
def x_market_share(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = (
        load_table(spark, sf, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    asia_cust = (
        load_table(spark, sf, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nat = (
        load_table(spark, sf, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("nk2"),
                                 F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("nk2"),
        )
        .select("s_suppkey", "nation")
    )
    vol = F.expr(_DISC_PRICE)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(asia_cust, F.col("o_custkey") == asia_cust.c_custkey)
        .join(supp_nat, li.l_suppkey == supp_nat.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0)))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "x_product_profit",
    oracle=(
        "SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) / 10000 "
        "AS sum_profit FROM ("
        "SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year, "
        f"CAST({_c2('l.l_extendedprice')} * ({_c2('(1 - l.l_discount)')} - "
        f"{_c2('l.l_tax')}) AS DECIMAL(38,0)) AS amount "
        "FROM lineitem l "
        "JOIN part p ON p.p_partkey = l.l_partkey "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN nation n ON n.n_nationkey = s.s_nationkey "
        "WHERE p.p_name LIKE '%widget%') t "
        "GROUP BY nation, o_year ORDER BY nation, o_year DESC"
    ),
    doc=(
        "TPC-H Q9 shape: profit by supplier nation and year for a "
        "product line (profit = extprice·((1−disc)−tax), replacing "
        "the absent ps_supplycost term; the LIKE filter hits p_name "
        "as in Q9). lineitem ⋈ orders is the one big shuffle; the "
        "name-filtered part and supplier→nation are broadcast. "
        "Amounts are exact integers in hundredths²; one division at "
        "the end."
    ),
    tags=("pricing", "join", "agg"),
)
def x_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = (
        load_table(spark, sf, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation")
    )
    s = (
        load_table(spark, sf, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("nk"))
        .select("s_suppkey", "nation")
    )
    amount = F.expr(
        f"CAST({_c2('l_extendedprice')} * ({_c2('(1 - l_discount)')} - "
        f"{_c2('l_tax')}) AS DECIMAL(38,0))"
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg((F.sum(amount).cast("double") / 10000).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "x_important_values",
    oracle=(
        "WITH v AS ("
        f"SELECT l.l_partkey, sum({_c2('l.l_extendedprice')}) AS val "
        "FROM lineitem l "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "JOIN nation n ON n.n_nationkey = s.s_nationkey "
        "WHERE n.n_name = 'NATION_3' GROUP BY l.l_partkey) "
        "SELECT l_partkey, CAST(val AS DOUBLE) / 100 AS total_value "
        "FROM v WHERE CAST(val AS DECIMAL(38,0)) * 1000 > "
        "(SELECT CAST(sum(val) AS DECIMAL(38,0)) FROM v) "
        "ORDER BY val DESC, l_partkey LIMIT 100"
    ),
    doc=(
        "TPC-H Q11 shape: parts representing a significant share of "
        "one nation's shipped value (lineitem value stands in for "
        "partsupp stock value). The scalar-subquery threshold is a "
        "1-row aggregate broadcast back over the per-part table; "
        "significance is the integer cross-multiplication "
        "val·1000 > Σval — no float threshold, bit-identical ties. "
        "The per-part agg is the only fact shuffle."
    ),
    tags=("agg", "subquery", "topk"),
)
def x_important_values(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    n = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    s = (
        load_table(spark, sf, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey")
    )
    v = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.expr(_c2("l_extendedprice"))).alias("val"))
    )
    tot = v.agg(F.sum(F.col("val").cast("decimal(38,0)")).alias("tot"))
    return (
        v.join(F.broadcast(tot), F.col("val").cast("decimal(38,0)") * 1000 > F.col("tot"))
        .select(
            "l_partkey",
            (F.col("val").cast("double") / 100).alias("total_value"),
            "val",
        )
        .orderBy(F.col("val").desc(), "l_partkey")
        .limit(100)
        .drop("val")
    )


@register(
    "x_supplier_part_count",
    oracle=(
        "SELECT p.p_brand, p.p_type, p.p_size, "
        "count(DISTINCT l.l_suppkey) AS supplier_cnt "
        "FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey "
        "WHERE p.p_brand <> 'Brand#5' "
        "AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49) "
        "AND l.l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000) "
        "GROUP BY p.p_brand, p.p_type, p.p_size "
        "ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size LIMIT 100"
    ),
    doc=(
        "TPC-H Q16 shape: distinct suppliers per (brand, type, size) "
        "slice, excluding a supplier blacklist (low s_acctbal stands "
        "in for Q16's complaint-comment filter). NOT IN over a "
        "non-null key decorrelates to a broadcast anti-join before "
        "the fact shuffle; count(DISTINCT) runs as Spark's two-phase "
        "partial-distinct expand, so the group shuffle carries "
        "(group, suppkey) pairs, not raw rows."
    ),
    tags=("join", "agg", "subquery"),
)
def x_supplier_part_count(spark: SparkSession, sf: str) -> DataFrame:
    p = (
        load_table(spark, sf, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select("s_suppkey")
    )
    li = load_table(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(100)
    )


@register(
    "x_promotion_candidates",
    oracle=(
        "SELECT s.s_suppkey, s.s_name FROM supplier s "
        "WHERE s.s_suppkey IN ("
        "SELECT l.l_suppkey FROM lineitem l "
        "WHERE l.l_partkey IN "
        "(SELECT p_partkey FROM part WHERE p_name LIKE 'small%') "
        "AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' "
        "AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00' "
        f"GROUP BY l.l_suppkey HAVING sum({_c2('l.l_quantity')}) > 3000) "
        "AND s.s_nationkey = "
        "(SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3') "
        "ORDER BY s.s_suppkey"
    ),
    doc=(
        "TPC-H Q20 shape: suppliers who moved significant volume of "
        "a product line in a year (shipped quantity stands in for "
        "ps_availqty). Two nested IN subqueries + a scalar nation "
        "lookup: the part-name IN becomes a broadcast semi-join on "
        "the scan, the HAVING group runs on the date-pruned fact, "
        "and the resulting qualifying-supplier set semi-joins "
        "supplier as a broadcast. Quantity threshold in exact "
        "hundredths."
    ),
    tags=("join", "subquery", "agg"),
)
def x_promotion_candidates(spark: SparkSession, sf: str) -> DataFrame:
    small = (
        load_table(spark, sf, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qual = (
        li.join(small, li.l_partkey == small.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.expr(_c2("l_quantity"))).alias("sq"))
        .filter(F.col("sq") > 3000)
        .select("l_suppkey")
    )
    nat = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    s = load_table(spark, sf, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey, "left_semi"
    )
    return (
        s.join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "x_waiting_orders",
    oracle=(
        "SELECT s.s_name, count(*) AS numwait "
        "FROM supplier s "
        "JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey "
        "JOIN orders o ON o.o_orderkey = l1.l_orderkey "
        "JOIN nation n ON n.n_nationkey = s.s_nationkey "
        "WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R' "
        "AND n.n_name = 'NATION_3' "
        "AND EXISTS (SELECT 1 FROM lineitem l2 "
        "WHERE l2.l_orderkey = l1.l_orderkey "
        "AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
        "WHERE l3.l_orderkey = l1.l_orderkey "
        "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') "
        "GROUP BY s.s_name ORDER BY numwait DESC, s.s_name LIMIT 100"
    ),
    doc=(
        "TPC-H Q21 shape: the sole at-fault supplier in multi-"
        "supplier finished orders (l_returnflag='R' stands in for "
        "the absent receiptdate>commitdate lateness flag). EXISTS → "
        "left-semi self-join, NOT EXISTS → left-anti self-join, both "
        "equi on l_orderkey with the suppkey≠ residual — the three "
        "lineitem legs shuffle on the same orderkey and Catalyst "
        "reuses one exchange; nation-filtered supplier is broadcast."
    ),
    tags=("join", "subquery", "agg"),
)
def x_waiting_orders(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    nat = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    s = (
        load_table(spark, sf, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
    )
    o = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        l1.join(s, F.col("sk") == s.s_suppkey)
        .join(o, F.col("ok") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "x_inactive_customers",
    oracle=(
        "WITH base AS ("
        f"SELECT c_custkey, c_nationkey AS cntrycode, {_c2('c_acctbal')} AS bal "
        "FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9)), "
        "stats AS ("
        "SELECT count(*) AS cnt, CAST(sum(bal) AS DECIMAL(38,0)) AS tot "
        "FROM base WHERE bal > 0) "
        "SELECT b.cntrycode, count(*) AS numcust, "
        "CAST(sum(b.bal) AS DOUBLE) / 100 AS totacctbal "
        "FROM base b, stats "
        "WHERE CAST(b.bal AS DECIMAL(38,0)) * stats.cnt > stats.tot "
        "AND NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_custkey = b.c_custkey "
        "AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00') "
        "GROUP BY b.cntrycode ORDER BY b.cntrycode"
    ),
    doc=(
        "TPC-H Q22 shape: dormant high-balance customers by country "
        "code (c_nationkey stands in for the phone prefix; 'no "
        "orders since 1999' for the seven-year dormancy). The "
        "above-average test is the integer cross-multiplication "
        "bal·cnt > Σbal against a broadcast 1-row stats aggregate — "
        "no float average. NOT EXISTS decorrelates to a left-anti "
        "join against the date-pruned orders scan, shuffling on "
        "custkey once."
    ),
    tags=("join", "subquery", "agg"),
)
def x_inactive_customers(spark: SparkSession, sf: str) -> DataFrame:
    base = (
        load_table(spark, sf, "customer")
        .filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9))
        .select(
            "c_custkey",
            F.col("c_nationkey").alias("cntrycode"),
            F.expr(_c2("c_acctbal")).alias("bal"),
        )
    )
    stats = base.filter(F.col("bal") > 0).agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("bal").cast("decimal(38,0)")).alias("tot"),
    )
    recent = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        base.join(recent, base.c_custkey == recent.o_custkey, "left_anti")
        .join(
            F.broadcast(stats),
            F.col("bal").cast("decimal(38,0)") * F.col("cnt") > F.col("tot"),
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("bal").cast("double") / 100).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )

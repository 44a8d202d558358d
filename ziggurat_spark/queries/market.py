"""Market-basket / co-occurrence analytics and skew diagnostics.

North-star analytics additions (the reference — a stream router,
SURVEY §2.1 — has no relational surface beyond windowed joins); these
are the standard "what co-occurs with what" shapes a training-data or
product pipeline computes downstream of the router, plus the
frequency-of-frequencies profile an engineer runs BEFORE a big join
to find out whether the key is skewed.

Scale shape (100 TB): baskets collect with ONE hash shuffle on
`l_orderkey`; all pair/triple generation then happens INSIDE the
array domain (transform-with-index + slice), partition-local and
bounded by per-order basket size k (k≈4 here; pairs k²/2, triads
k³/6 — per-group constants, never cross-order, never a self-join
that would shuffle the fact table twice). No driver collects; top-k
results go through TakeOrderedAndProject (per-partition heap +
driver merge of k rows, never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


def _basket_arrays(spark: SparkSession, sf: str) -> DataFrame:
    """One sorted part-set array per order — ONE shuffle (the groupBy
    on l_orderkey); all pair/triple generation after this is
    partition-local array-domain work bounded by basket size k."""
    return (
        load_table(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )


#: i<j pairs of a sorted array, generated inside the array domain
#: (transform-with-index + slice) — no self-join, no re-shuffle.
_PAIRS_EXPR = (
    "flatten(transform(parts, (x, i) -> "
    "transform(slice(parts, i + 2, size(parts)), "
    "y -> struct(x AS pa, y AS pb))))"
)

#: i<j<k triples, same construction one level deeper.
_TRIPLES_EXPR = (
    "flatten(transform(parts, (x, i) -> "
    "flatten(transform(slice(parts, i + 2, size(parts)), (y, j) -> "
    "transform(slice(parts, i + j + 3, size(parts)), "
    "z -> struct(x AS pa, y AS pb, z AS pc))))))"
)


_BASKET_CTE = "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"


@register(
    "x_basket_pairs",
    oracle=(
        f"WITH d AS ({_BASKET_CTE}) "
        "SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n "
        "FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey "
        "GROUP BY pa, pb ORDER BY n DESC, pa, pb LIMIT 100"
    ),
    doc=(
        "Market-basket co-occurrence: top part pairs ordered "
        "together. ONE shuffle total: baskets collect per order, "
        "then i<j pairs generate INSIDE the array domain "
        "(transform-with-index + slice — k²/2 per basket with small "
        "bounded k) instead of a self-join that would shuffle "
        "lineitem twice. Map-side-combined count, total-ordered "
        "top-100 via TakeOrderedAndProject. Sorting the part-set "
        "makes (pa,pb) canonical."
    ),
    tags=("market", "join", "analytics"),
)
def x_basket_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _basket_arrays(spark, sf)
        .select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pa", "pb")
        .limit(100)
    )


@register(
    "x_triangle_count",
    oracle=(
        f"WITH d AS ({_BASKET_CTE}), "
        "t AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb, "
        "c.l_partkey AS pc FROM d a "
        "JOIN d b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey "
        "JOIN d c ON a.l_orderkey = c.l_orderkey "
        "AND b.l_partkey < c.l_partkey) "
        "SELECT count(*) AS n_triads, "
        "count(DISTINCT (pa, pb, pc)) AS n_unique FROM t"
    ),
    doc=(
        "Triangle counting over the co-purchase hypergraph: ordered "
        "part triples appearing in one basket, total and distinct. "
        "Same ONE-shuffle basket collection as x_basket_pairs with "
        "triple generation nested one level deeper in the array "
        "domain (k³/6 per basket, bounded k) — the classic "
        "graph-triangle shape without an edge-list blow-up or a "
        "3-way self-join; the distinct count is one extra hash-agg "
        "on the triple key."
    ),
    tags=("market", "graph", "join"),
)
def x_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    t = (
        _basket_arrays(spark, sf)
        .select(F.explode(F.expr(_TRIPLES_EXPR)).alias("t"))
        .select("t.pa", "t.pb", "t.pc")
    )
    # two-level aggregate instead of count + count_distinct in one
    # agg: the mixed form plans an Expand that duplicates the triple
    # stream; grouping on the triple key first map-side-combines and
    # yields both totals from the (much smaller) distinct table.
    g = t.groupBy("pa", "pb", "pc").agg(F.count("*").alias("c"))
    return g.agg(
        F.sum("c").cast("bigint").alias("n_triads"),
        F.count("*").alias("n_unique"),
    )


@register(
    "x_activity_streaks",
    oracle=(
        "WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d "
        "FROM events), "
        "s AS (SELECT user_id, d, d - CAST(row_number() OVER "
        "(PARTITION BY user_id ORDER BY d) AS INTEGER) AS anchor FROM d) "
        "SELECT user_id, CAST(min(d) AS VARCHAR) AS streak_start, "
        "count(*) AS days FROM s GROUP BY user_id, anchor "
        "ORDER BY user_id, streak_start"
    ),
    doc=(
        "Gaps-and-islands: per-user runs of consecutive active days "
        "via the date-minus-row_number anchor trick. One shuffle on "
        "user_id serves the distinct, the window AND the final "
        "group-by (same partitioning reused); state is O(distinct "
        "active days), never O(events)."
    ),
    tags=("analytics", "behavior", "window"),
)
def x_activity_streaks(spark: SparkSession, sf: str) -> DataFrame:
    d = (
        load_table(spark, sf, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .dropDuplicates()
    )
    return day_streaks(d)


def day_streaks(days: DataFrame) -> DataFrame:
    """Runs of consecutive days per user from distinct
    ``days(user_id, d DATE)`` via the date-minus-row_number anchor.
    Property-tested against a pure-Python run-length reference
    (tests/test_properties.py). streak_start goes out as STRING: a
    bare DATE round-trips through pandas differently across sessions
    (datetime.date vs datetime64) and the driver's session is not
    ours to configure."""
    w = Window.partitionBy("user_id").orderBy("d")
    s = days.withColumn("anchor", F.date_sub("d", F.row_number().over(w)))
    return (
        s.groupBy("user_id", "anchor")
        .agg(
            F.min("d").cast("string").alias("streak_start"),
            F.count("*").alias("days"),
        )
        .select("user_id", "streak_start", "days")
        .orderBy("user_id", "streak_start")
    )


@register(
    "x_time_to_convert",
    oracle=(
        "WITH v AS (SELECT user_id, min(ts) AS tv FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "p AS (SELECT user_id, min(ts) AS tp FROM events "
        "WHERE event_type = 'purchase' GROUP BY user_id) "
        "SELECT v.user_id AS user_id, "
        "epoch_us(p.tp) - epoch_us(v.tv) AS micros "
        "FROM v JOIN p ON p.user_id = v.user_id WHERE p.tp > v.tv "
        "ORDER BY user_id"
    ),
    doc=(
        "Time-to-convert: exact microseconds from a user's first "
        "'view' to their first 'purchase' (converters only). Two "
        "filtered min-aggregates on user_id joined co-partitioned — "
        "the timestamps never leave integer microsecond space "
        "(unix_micros / epoch_us), so the result is engine-exact."
    ),
    tags=("analytics", "behavior"),
)
def x_time_to_convert(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        v.join(p, "user_id")
        .filter(F.col("tp") > F.col("tv"))
        .select(
            "user_id",
            (F.unix_micros("tp") - F.unix_micros("tv")).alias("micros"),
        )
        .orderBy("user_id")
    )


@register(
    "x_key_distribution",
    oracle=(
        "WITH k AS (SELECT l_partkey, count(*) AS cnt FROM lineitem "
        "GROUP BY l_partkey) "
        "SELECT cnt, count(*) AS n_keys, min(l_partkey) AS sample_key "
        "FROM k GROUP BY cnt ORDER BY cnt"
    ),
    doc=(
        "Skew diagnostic: frequency-of-frequencies of the join key "
        "(how many partkeys occur n times). Two cascaded hash "
        "aggregates — the first is the expensive one (map-side "
        "combined, one shuffle on l_partkey); the second runs over "
        "|distinct keys| rows. This is the profile that decides "
        "whether x_salted_join / AQE skew handling is needed BEFORE "
        "burning a 100 TB shuffle."
    ),
    tags=("quality", "skew", "agg"),
)
def x_key_distribution(spark: SparkSession, sf: str) -> DataFrame:
    k = (
        load_table(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        k.groupBy("cnt")
        .agg(
            F.count("*").alias("n_keys"),
            F.min("l_partkey").alias("sample_key"),
        )
        .orderBy("cnt")
    )


@register(
    "x_skyline_frontier",
    oracle=(
        "WITH pc AS (SELECT CAST(round(p_retailprice * 100) AS BIGINT) "
        "AS price_c, p_size, p_partkey FROM part), "
        "m AS (SELECT price_c, max(p_size) AS size FROM pc "
        "GROUP BY price_c), "
        "r AS (SELECT m.price_c, m.size, min(pc.p_partkey) AS part_id "
        "FROM m JOIN pc ON pc.price_c = m.price_c "
        "AND pc.p_size = m.size GROUP BY m.price_c, m.size), "
        "f AS (SELECT price_c, size, part_id, max(size) OVER "
        "(ORDER BY price_c ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "1 PRECEDING) AS prev_max FROM r) "
        "SELECT price_c, size, part_id FROM f "
        "WHERE prev_max IS NULL OR size > prev_max ORDER BY price_c"
    ),
    doc=(
        "Skyline (Pareto frontier) query — Borzsony/Kossmann/Stocker "
        "'01 — over (minimize price, maximize size): a part is on "
        "the frontier iff no strictly cheaper part is at least as "
        "big. The classic nested-NOT-EXISTS spelling is O(n²); this "
        "is the sort-scan spelling: collapse to max-size per price "
        "point (integer cents), then one running-max window pass "
        "keeps frontier points. Price-point cardinality bounds the "
        "window input, and the single-partition window runs over "
        "price points, not parts — at 100 TB the groupBy does the "
        "heavy lifting map-side and the frontier scan is O(distinct "
        "prices)."
    ),
    tags=("analytics", "skyline", "window"),
)
def x_skyline_frontier(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part").select(
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias(
            "price_c"
        ),
        F.col("p_size").alias("size"),
        F.col("p_partkey").alias("part_id"),
    )
    return pareto_frontier(p)


def pareto_frontier(points: DataFrame) -> DataFrame:
    """Skyline of ``points(price_c, size, part_id)`` under
    (minimize price_c, maximize size): collapse to max-size per
    price point, then keep points whose size beats the running max
    over all strictly cheaper points. Property-tested against the
    brute-force NOT-EXISTS definition (tests/test_properties.py)."""
    m = points.groupBy("price_c").agg(F.max("size").alias("size"))
    r = (
        m.join(points.withColumnRenamed("size", "psize"), ["price_c"])
        .filter(F.col("size") == F.col("psize"))
        .groupBy("price_c", "size")
        .agg(F.min("part_id").alias("part_id"))
    )
    w = (
        Window.orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    f = r.withColumn("prev_max", F.max("size").over(w))
    return (
        f.filter(F.col("prev_max").isNull() | (F.col("size") > F.col("prev_max")))
        .select("price_c", "size", "part_id")
        .orderBy("price_c")
    )


#: ONE string, executed verbatim by BOTH engines — the SQL-text
#: interface demonstration: a user can hand the engine ANSI SQL
#: instead of DataFrame calls and get the identical plan/result.
_SQL_TEXT = (
    "SELECT o_orderpriority, count(*) AS n, "
    "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
    "AS total_c, min(o_orderkey) AS first_key "
    "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
)


@register(
    "x_sql_text_interface",
    oracle=_SQL_TEXT,
    doc=(
        "The SQL front door: the engine registers the loaded tables "
        "as views and executes a raw ANSI SQL string via spark.sql — "
        "the SAME string the DuckDB oracle runs, byte for byte "
        "(dialect-portable subset). Proves query-text capability on "
        "top of the DataFrame surface; Catalyst plans it identically "
        "to the equivalent DataFrame chain (one map-side-combined "
        "aggregate, scaled-integer money sum)."
    ),
    tags=("sql", "interface", "agg"),
)
def x_sql_text_interface(spark: SparkSession, sf: str) -> DataFrame:
    load_table(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SQL_TEXT)

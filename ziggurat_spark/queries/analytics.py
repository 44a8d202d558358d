"""Analytics capability superset: sessionization, per-group top-k,
pivot, quantiles, CUBE, and three more TPC-H join/agg shapes.

The reference has no analytics surface (SURVEY §2.1 — its only
aggregations are metric counters), but sessionization IS the batch
embodiment of its stream semantics: Kafka Streams session windows
over the record key, which ziggurat's join-window machinery
(`streams.clj:149-158`) approximates. Everything here is expressed
so the plan is one shuffle per groupBy/window and dimension sides
broadcast — the shapes that decide 100 TB behavior.

Float parity: money aggregates reuse the scaled-integer
DECIMAL(38,0) spelling from queries/pricing.py; quantiles use a
nearest-rank definition (no interpolation arithmetic to disagree
on) over scaled-integer values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ziggurat_spark.queries.pricing import _DISC_PRICE
from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table

#: session gap: 30 minutes, in microseconds
_GAP_US = 30 * 60 * 1_000_000


@register(
    "x_sessionize",
    oracle=(
        "WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events), "
        "g AS (SELECT user_id, event_id, us, "
        "  CASE WHEN us - lag(us) OVER w IS NULL "
        f"       OR us - lag(us) OVER w > {_GAP_US} THEN 1 ELSE 0 END AS new_s "
        "  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), "
        "s AS (SELECT user_id, event_id, us, "
        "  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id "
        "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "  AS session_id FROM g) "
        "SELECT user_id, session_id, count(*) AS n_events, "
        "  max(us) - min(us) AS duration_us "
        "FROM s GROUP BY user_id, session_id "
        "ORDER BY user_id, session_id"
    ),
    doc=(
        "Gap-based sessionization (30 min): the batch form of "
        "session windows (superset of the reference's join-window "
        "semantics). One shuffle on user_id serves both the lag "
        "window and the running sum; the final groupBy re-uses the "
        "same partitioning. At 100 TB the user_id shuffle is the "
        "only exchange; skewed users are bounded by session count, "
        "not event count."
    ),
    tags=("window", "session", "streaming-superset"),
)
def x_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_s = F.when(
        F.lag("us").over(w).isNull()
        | ((F.col("us") - F.lag("us").over(w)) > _GAP_US),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = e.withColumn("new_s", new_s).withColumn(
        "session_id", F.sum("new_s").over(run)
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.max("us") - F.min("us")).alias("duration_us"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "x_topk_per_group",
    oracle=(
        "SELECT user_id, event_id, value, rn FROM ("
        "  SELECT user_id, event_id, value, row_number() OVER ("
        "    PARTITION BY user_id ORDER BY value DESC, event_id) AS rn "
        "  FROM events) WHERE rn <= 3 ORDER BY user_id, rn"
    ),
    doc=(
        "Top-3 events per user: rank-window + filter. Catalyst "
        "inserts a per-partition rank limit (WindowGroupLimit) "
        "before the shuffle, so at 100 TB each map task forwards "
        "at most k rows per key instead of the full partition."
    ),
    tags=("window", "topk"),
)
def x_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        e.select("user_id", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("user_id", "rn")
    )


@register(
    "x_pivot_event_counts",
    oracle=(
        "SELECT date_trunc('day', ts) AS d, "
        "  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
        "    AS BIGINT) AS clicks, "
        "  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
        "    AS BIGINT) AS views, "
        "  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
        "    AS BIGINT) AS purchases, "
        "  CAST(sum(CASE WHEN event_type NOT IN ('click','view','purchase') "
        "      THEN 1 ELSE 0 END) AS BIGINT) AS other "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "Pivot spelled as conditional aggregation — the scale-safe "
        "form (df.pivot collects the key domain to the driver; a "
        "fixed CASE list keeps the plan static and one-shuffle)."
    ),
    tags=("agg", "pivot"),
)
def x_pivot_event_counts(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")

    def tally(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    et = F.col("event_type")
    return (
        e.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(
            tally(et == "click").alias("clicks"),
            tally(et == "view").alias("views"),
            tally(et == "purchase").alias("purchases"),
            tally(~et.isin("click", "view", "purchase")).alias("other"),
        )
        .orderBy("d")
    )


@register(
    "x_quantiles",
    oracle=(
        "WITH s AS (SELECT event_type, "
        "  CAST(round(value * 1000000) AS BIGINT) AS v, event_id FROM events), "
        "r AS (SELECT event_type, v, "
        "  row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn, "
        "  count(*) OVER (PARTITION BY event_type) AS n FROM s) "
        "SELECT event_type, "
        "  max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT) THEN v END) AS p50, "
        "  max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT) THEN v END) AS p90, "
        "  max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN v END) AS p99 "
        "FROM r GROUP BY event_type ORDER BY event_type"
    ),
    doc=(
        "Nearest-rank p50/p90/p99 per event_type (the metrics "
        "histogram surface, `metrics.clj:117-128`, as exact "
        "quantiles). Nearest-rank over scaled integers avoids "
        "interpolation arithmetic, so Spark and DuckDB agree "
        "bit-for-bit. At 100 TB the streaming spelling is "
        "approx_percentile; this exact form is the oracle anchor."
    ),
    tags=("agg", "quantile", "metrics"),
)
def x_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select(
        "event_type",
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("v"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("v", "event_id")
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )

    def at(q: float) -> F.Column:
        rank = F.ceil(F.lit(q) * F.col("n")).cast("bigint")
        return F.max(F.when(F.col("rn") == rank, F.col("v")))

    return (
        r.groupBy("event_type")
        .agg(at(0.50).alias("p50"), at(0.90).alias("p90"), at(0.99).alias("p99"))
        .orderBy("event_type")
    )


@register(
    "x_cube_counts",
    oracle=(
        "SELECT event_type, "
        "  CASE WHEN value > 0.5 THEN 'hi' ELSE 'lo' END AS band, "
        "  count(*) AS n, "
        "  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv "
        "FROM events GROUP BY CUBE(event_type, band) "
        "ORDER BY event_type NULLS FIRST, band NULLS FIRST, n"
    ),
    doc=(
        "CUBE over (event_type, band): all four grouping sets in "
        "one pass — Spark expands to a single Expand + one shuffle, "
        "not four scans (z18 covers ROLLUP; this is the full "
        "lattice)."
    ),
    tags=("agg", "cube"),
)
def x_cube_counts(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select(
        "event_type",
        F.when(F.col("value") > 0.5, "hi").otherwise("lo").alias("band"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cv"),
    )
    return (
        e.cube("event_type", "band")
        .agg(F.count("*").alias("n"), F.sum("cv").alias("sv"))
        .orderBy(
            F.col("event_type").asc_nulls_first(),
            F.col("band").asc_nulls_first(),
            "n",
        )
    )


@register(
    "x_local_supplier_volume",
    oracle=(
        "SELECT n_name, "
        f"CAST(sum({_DISC_PRICE.replace('l_', 'l.l_')}) AS DOUBLE) / 10000 "
        "AS revenue "
        "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "  AND c.c_nationkey = s.s_nationkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name = 'ASIA' "
        "AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00' "
        "GROUP BY n_name ORDER BY revenue DESC, n_name"
    ),
    doc=(
        "TPC-H Q5 shape: 6-table star join. region/nation/supplier/"
        "customer broadcast (dims), lineitem-orders is the one "
        "shuffled join; revenue per nation. The c_nationkey = "
        "s_nationkey clause rides the existing joins — no extra "
        "exchange."
    ),
    tags=("pricing", "join"),
)
def x_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf, "nation")
    s = load_table(spark, sf, "supplier")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem")
    nr = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    snr = s.join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    oc = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_nationkey"
    )
    return (
        li.join(oc, li.l_orderkey == oc.o_orderkey)
        .join(
            snr,
            (li.l_suppkey == snr.s_suppkey)
            & (F.col("c_nationkey") == snr.s_nationkey),
        )
        .groupBy("n_name")
        .agg((F.sum(F.expr(_DISC_PRICE)).cast("double") / 10000).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "x_returned_items",
    oracle=(
        "SELECT c.c_custkey, c.c_name, "
        f"CAST(sum({_DISC_PRICE.replace('l_', 'l.l_')}) AS DOUBLE) / 10000 "
        "AS revenue, n.n_name "
        "FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE l.l_returnflag = 'R' "
        "AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' "
        "AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00' "
        "GROUP BY c.c_custkey, c.c_name, n.n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
    doc=(
        "TPC-H Q10 shape: returned-item revenue per customer, "
        "top-20. lineitem filtered on returnflag at the scan; "
        "orders date-filtered; customer/nation broadcast; one "
        "shuffle joins the facts, one groups."
    ),
    tags=("pricing", "join", "topk"),
)
def x_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_name", "n_name"
    )
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(cn, F.col("o_custkey") == cn.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(F.expr(_DISC_PRICE)).cast("double") / 10000).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "x_order_priority",
    oracle=(
        "SELECT o.o_orderpriority, count(*) AS n FROM orders o "
        "WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
        "AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00' "
        "AND EXISTS (SELECT 1 FROM lineitem l "
        "  WHERE l.l_orderkey = o.o_orderkey "
        "  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) "
        "GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"
    ),
    doc=(
        "TPC-H Q4 shape: EXISTS decorrelates to a left-semi join on "
        "o_orderkey with the late-ship predicate evaluated inside "
        "the join — no second aggregation, no distinct. At scale "
        "the semi join shuffles once on orderkey and short-circuits "
        "per probe row."
    ),
    tags=("join", "semi", "agg"),
)
def x_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAY")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )

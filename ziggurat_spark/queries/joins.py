"""Join surface (Z10–Z15) — J1–J4 of the reference plus the standard
relational superset (semi/anti/multi-way).

The reference's only relational operators are windowed stream-stream
equi-joins on the Kafka key (streams.clj:149-179): inner/left/outer
within ±join-window-ms. Batch embodiments below; the streaming forms
live in ziggurat_spark.operators.stream_joins.

Scale notes (100 TB):
- dimension joins (orders⋈customer, nation⋈supplier) are
  broadcast-able — we hint ``F.broadcast`` where a side is a
  dimension table so no shuffle of the fact side's data occurs;
- the windowed self-join (Z11) is an equi-join on the key with a
  time-band residual predicate: Catalyst plans it as a sort-merge
  join on user_id, and the band filter prunes pairs — never a
  cartesian;
- AQE converts sort-merge→broadcast at runtime when the small side
  is under the threshold, and splits skewed user_id partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


@register(
    "z10_equi_inner_join",
    oracle=(
        "SELECT o.o_orderkey, c.c_name FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "ORDER BY o.o_orderkey LIMIT 1000"
    ),
    doc="J1 key equi-join, batch form; customer side broadcast.",
    tags=("join",),
)
def z10(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
        .limit(1000)
    )


@register(
    "z11_windowed_self_join",
    oracle=(
        "SELECT a.event_id AS l, b.event_id AS r FROM events a JOIN events b "
        "ON a.user_id = b.user_id "
        "AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts + INTERVAL 1 HOUR "
        "AND a.event_id < b.event_id ORDER BY l, r LIMIT 5000"
    ),
    doc=(
        "J1 windowed join (streams.clj:149-158): equal key within "
        "±window, as a BUCKETED band join: both sides keyed on "
        "(user_id, hour_bucket) with the left side exploded to its "
        "bucket ± 1, then the exact ±1h residual applied post-match. "
        "A key-only equi-join pairs every event of a user with every "
        "other (O(k²) per user — a hot user explodes); adding the "
        "time bucket to the join key bounds fan-out to window-"
        "adjacent events regardless of per-user volume. Each "
        "qualifying pair matches in exactly one bucket (the right "
        "row's own), so no dedup is needed. Same plan Structured "
        "Streaming uses internally for time-interval joins; here "
        "spelled explicitly for the batch oracle."
    ),
    tags=("join", "window"),
)
def z11(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    hb = F.expr("unix_timestamp(ts) div 3600")
    a = e.select(
        F.col("event_id"),
        F.col("user_id"),
        F.col("ts"),
        F.explode(F.array(hb - 1, hb, hb + 1)).alias("bkt"),
    ).alias("a")
    b = e.select(
        F.col("event_id"), F.col("user_id"), F.col("ts"), hb.alias("bkt")
    ).alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.bkt") == F.col("b.bkt"))
        & (F.col("b.ts") >= F.col("a.ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR"))
        & (F.col("a.event_id") < F.col("b.event_id"))
    )
    return (
        a.join(b, cond, "inner")
        .select(F.col("a.event_id").alias("l"), F.col("b.event_id").alias("r"))
        .orderBy("l", "r")
        .limit(5000)
    )


@register(
    "z12_left_join",
    oracle=(
        "SELECT c.c_custkey, count(o.o_orderkey) AS n FROM customer c "
        "LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_custkey ORDER BY c.c_custkey"
    ),
    doc="J2 left join (streams.clj:156): unmatched left survives as NULL right.",
    tags=("join",),
)
def z12(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n"))
        .orderBy("c_custkey")
    )


@register(
    "z13_full_outer_join",
    oracle=(
        "SELECT coalesce(n.n_nationkey, -1) AS nk, coalesce(s.s_suppkey, -1) AS sk "
        "FROM nation n FULL OUTER JOIN supplier s ON s.s_nationkey = n.n_nationkey "
        "ORDER BY nk, sk"
    ),
    doc="J3 outer join (streams.clj:157): either side nullable.",
    tags=("join",),
)
def z13(spark: SparkSession, sf: str) -> DataFrame:
    n = load_table(spark, sf, "nation")
    s = load_table(spark, sf, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey, "full_outer")
        .select(
            F.coalesce("n_nationkey", F.lit(-1)).alias("nk"),
            F.coalesce("s_suppkey", F.lit(-1)).alias("sk"),
        )
        .orderBy("nk", "sk")
    )


@register(
    "z14_semi_anti_join",
    oracle=(
        "SELECT c_custkey, has_orders FROM ("
        "  SELECT c_custkey, TRUE AS has_orders FROM customer "
        "  WHERE c_custkey IN (SELECT o_custkey FROM orders) "
        "  UNION ALL "
        "  SELECT c_custkey, FALSE AS has_orders FROM customer "
        "  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)"
        ") t ORDER BY c_custkey"
    ),
    doc=(
        "Semi + anti join (capability superset; the reference routes "
        "matched/unmatched streams, this is the batch analogue). "
        "left_semi/left_anti avoid materializing the right side's columns."
    ),
    tags=("join",),
)
def z14(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").select("o_custkey")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", F.lit(True).alias("has_orders")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", F.lit(False).alias("has_orders")
    )
    return semi.unionAll(anti).orderBy("c_custkey")


@register(
    "z15_multiway_join_chain",
    oracle=(
        "SELECT r.r_name, n.n_name, count(*) AS suppliers FROM region r "
        "JOIN nation n ON n.n_regionkey = r.r_regionkey "
        "JOIN supplier s ON s.s_nationkey = n.n_nationkey "
        "GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name"
    ),
    doc=(
        "J4 N-way join chain (streams.clj:163-179, reduce over "
        ":input-topics). region/nation are tiny dims → broadcast both; "
        "the supplier fact never shuffles."
    ),
    tags=("join",),
)
def z15(spark: SparkSession, sf: str) -> DataFrame:
    r = load_table(spark, sf, "region")
    n = load_table(spark, sf, "nation")
    s = load_table(spark, sf, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("suppliers"))
        .orderBy("r_name", "n_name")
    )


@register(
    "x_asof_join",
    oracle=(
        "WITH od AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS "
        "o_orderkey FROM orders GROUP BY 1, 2) "
        "SELECT e.event_id, od.o_orderdate AS asof_o_orderdate, od.o_orderkey "
        "FROM events e ASOF LEFT JOIN od "
        "ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate "
        "ORDER BY e.event_id LIMIT 5000"
    ),
    doc=(
        "Backward as-of join (operators/asof.py): each event matched "
        "to the user's latest order at or before the event time — "
        "one shuffle + one sort, no join fan-out (the naive theta-"
        "join explodes O(lefts x rights) per key). Right side deduped "
        "per (key, ts) for determinism; DuckDB's native ASOF JOIN is "
        "the oracle."
    ),
    tags=("join", "asof"),
)
def x_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.operators.asof import asof_join_backward

    e = load_table(spark, sf, "events").select("event_id", "user_id", "ts")
    od = (
        load_table(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = asof_join_backward(
        e, od, on=["user_id"], left_ts="ts", right_ts="o_orderdate"
    )
    return (
        out.select("event_id", "asof_o_orderdate", "o_orderkey")
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "x_asof_forward",
    oracle=(
        "WITH clicks AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'click'), "
        "views AS (SELECT user_id, ts, max(event_id) AS view_id "
        "FROM events WHERE event_type = 'view' GROUP BY 1, 2) "
        "SELECT c.event_id, v.ts AS asof_ts, v.view_id "
        "FROM clicks c ASOF LEFT JOIN views v "
        "ON c.user_id = v.user_id AND c.ts <= v.ts "
        "ORDER BY c.event_id LIMIT 5000"
    ),
    doc=(
        "Forward as-of join (operators/asof.py::asof_join_forward): "
        "each click matched to the user's EARLIEST view at or after "
        "the click time — the click-to-conversion primitive. Same "
        "union+window plan as the backward variant (one shuffle, one "
        "sort, zero pair fan-out); DuckDB's native forward ASOF JOIN "
        "is the oracle. Right side deduped per (key, ts) for "
        "determinism."
    ),
    tags=("join", "asof"),
)
def x_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.operators.asof import asof_join_forward

    e = load_table(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    out = asof_join_forward(
        clicks,
        views.withColumnRenamed("ts", "vts"),
        on=["user_id"],
        left_ts="ts",
        right_ts="vts",
    )
    return (
        out.select(
            "event_id", F.col("asof_vts").alias("asof_ts"), "view_id"
        )
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "x_correlated_scalar_subquery",
    oracle=(
        "SELECT c_custkey, "
        "(SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) "
        "AS n_orders, "
        "coalesce((SELECT CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) "
        "AS BIGINT) FROM orders o WHERE o.o_custkey = c.c_custkey), -1) "
        "AS max_price100 "
        "FROM customer c ORDER BY c_custkey LIMIT 2000"
    ),
    doc=(
        "Correlated scalar subqueries in the SELECT list (count and "
        "max per outer row): Catalyst decorrelates both into ONE "
        "grouped aggregate over orders joined back left-outer — "
        "never a per-customer rescan. Identical ANSI text on both "
        "engines; NULL-count semantics (no orders → count 0, max "
        "NULL → -1) pinned by coalesce."
    ),
    tags=("join", "subquery"),
)
def x_correlated_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").alias("_n"),
        F.max(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias(
            "_mx"
        ),
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("_n", F.lit(0)).alias("n_orders"),
            F.coalesce("_mx", F.lit(-1)).alias("max_price100"),
        )
        .orderBy("c_custkey")
        .limit(2000)
    )


@register(
    "x_asof_nearest",
    oracle=(
        "WITH od AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS "
        "o_orderkey FROM orders GROUP BY 1, 2), "
        "b AS (SELECT e.event_id, od.o_orderdate AS bd, od.o_orderkey AS bk "
        "FROM events e ASOF LEFT JOIN od "
        "ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate), "
        "f AS (SELECT e.event_id, od.o_orderdate AS fd, od.o_orderkey AS fk "
        "FROM events e ASOF LEFT JOIN od "
        "ON e.user_id = od.o_custkey AND e.ts <= od.o_orderdate) "
        "SELECT e.event_id, "
        "CASE WHEN bd IS NOT NULL AND (fd IS NULL OR (e.ts - bd) <= "
        "(fd - e.ts)) THEN bd ELSE fd END AS nearest_o_orderdate, "
        "CASE WHEN bd IS NOT NULL AND (fd IS NULL OR (e.ts - bd) <= "
        "(fd - e.ts)) THEN bk ELSE fk END AS o_orderkey "
        "FROM events e JOIN b USING (event_id) JOIN f USING (event_id) "
        "ORDER BY e.event_id LIMIT 5000"
    ),
    doc=(
        "Nearest as-of join (operators/asof.py::asof_join_nearest — "
        "pandas merge_asof direction='nearest' semantics, ties "
        "backward): each event matched to the user's CLOSEST order "
        "date in either direction. Single-pass spelling: rights "
        "enter the union twice (back/forward tags bracketing lefts) "
        "so ONE shuffle + ONE sort serves both directions — the "
        "oracle needs two ASOF joins plus a re-join to say the same "
        "thing. Zero pair fan-out, O(L + 2R) state."
    ),
    tags=("join", "asof"),
)
def x_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.operators.asof import asof_join_nearest

    e = load_table(spark, sf, "events").select("event_id", "user_id", "ts")
    od = (
        load_table(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = asof_join_nearest(
        e, od, on=["user_id"], left_ts="ts", right_ts="o_orderdate"
    )
    return (
        out.select("event_id", "nearest_o_orderdate", "o_orderkey")
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "x_join_strategy_hints",
    oracle=(
        "SELECT o.o_orderpriority, count(*) AS n, "
        "CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) "
        "AS BIGINT) AS rev_c "
        "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"
    ),
    doc=(
        "Join-strategy control surface: the same fact-fact equi-join "
        "every TPC-H shape uses, but with an explicit SHUFFLE_HASH "
        "hint — the engine exposes Spark's full strategy menu "
        "(broadcast / shuffle-hash / sort-merge) per join when the "
        "optimizer's default is wrong for a known workload: "
        "shuffle-hash skips both sort phases when one side's "
        "per-partition build fits memory, the classic win for a "
        "medium dimension too big to broadcast. Plan-pinned to "
        "ShuffledHashJoin; results are strategy-invariant (the "
        "oracle doesn't know or care)."
    ),
    tags=("join", "hints", "agg"),
)
def x_join_strategy_hints(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias(
            "price_c"
        ),
    )
    o = (
        load_table(spark, sf, "orders")
        .select("o_orderkey", "o_orderpriority")
        .hint("shuffle_hash")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("price_c").alias("rev_c"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "x_null_safe_join",
    oracle=(
        "WITH o AS (SELECT o_orderkey, CASE WHEN o_orderkey % 499 = 0 "
        "THEN NULL ELSE o_custkey END AS k FROM orders), "
        "c AS (SELECT c_custkey, CASE WHEN c_custkey % 101 = 0 "
        "THEN NULL ELSE c_custkey END AS k FROM customer) "
        "SELECT count(*) AS n_pairs, "
        "CAST(sum(CASE WHEN o.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_null_pairs, "
        "CAST(sum(o.o_orderkey % 1000000 + c.c_custkey % 1000000) "
        "AS BIGINT) AS checksum "
        "FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k"
    ),
    doc=(
        "Null-safe equi-join: Spark's <=> (eqNullSafe) ≡ SQL's IS "
        "NOT DISTINCT FROM — NULL keys match each other instead of "
        "vanishing, the semantics CDC/merge pipelines need when the "
        "join key itself is nullable (ziggurat's Kafka record key "
        "CAN be null, streams.clj:129; a key-join that silently "
        "drops null-keyed records loses data). Graded via pair "
        "count, null-pair count, and a modular checksum over both "
        "sides. Plan note: <=> is still an EQUI join condition — "
        "Spark hash-partitions on the key with null-safe "
        "comparison, never a nested-loop. The null×null block is a "
        "deliberate skew hotspot kept small here (~0.2% × ~1%); at "
        "scale the null cohort routes through the salting toolkit "
        "(x_salted_join)."
    ),
    tags=("joins", "null-safe"),
)
def x_null_safe_join(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 499 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("k"),
    )
    c = load_table(spark, sf, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 101 == 0, None)
        .otherwise(F.col("c_custkey"))
        .alias("k"),
    )
    j = o.join(c, o["k"].eqNullSafe(c["k"]))
    return j.agg(
        F.count("*").alias("n_pairs"),
        F.sum(
            F.when(o["k"].isNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_null_pairs"),
        F.sum(
            F.col("o_orderkey") % 1000000 + F.col("c_custkey") % 1000000
        ).cast("bigint").alias("checksum"),
    )


@register(
    "x_join_pair_delay",
    oracle=(
        "SELECT a.user_id % 16 AS ub, count(*) AS n_pairs, "
        "CAST(sum(abs(epoch_us(b.ts) - epoch_us(a.ts))) AS BIGINT) "
        "AS sum_abs_us, "
        "CAST(max(abs(epoch_us(b.ts) - epoch_us(a.ts))) AS BIGINT) "
        "AS max_abs_us "
        "FROM events a JOIN events b ON a.user_id = b.user_id "
        "AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts + INTERVAL 1 HOUR "
        "AND a.event_id < b.event_id "
        "GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "T9 graded — the joined-pair timestamp-diff metric "
        "(stream_joins_diff.clj:5-17 histograms "
        "abs(left.ts − right.ts) for every joined pair): here the "
        "J1-shaped ±1h self-join feeds an exact integer-µs delay "
        "aggregate per user cohort — count, sum, max of |Δts| — the "
        "same histogram content the reference emits to its metrics "
        "backend, as a hash-checkable result. Pair generation reuses "
        "Z11's bucketed band join (join key carries the hour bucket, "
        "so fan-out stays window-local — no O(k²)-per-user blowup); "
        "the metric rides the join output as a map-side-combined "
        "aggregate, state O(16 cohorts). In production this exact "
        "aggregate ships via df.observe on the streaming join "
        "(x_stream_windowed_join runs the join itself under "
        "watermarks)."
    ),
    tags=("join", "metrics", "window"),
)
def x_join_pair_delay(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    hb = F.expr("unix_timestamp(ts) div 3600")
    a = e.select(
        F.col("event_id").alias("l_id"),
        "user_id",
        F.unix_micros("ts").alias("l_us"),
        F.explode(
            F.array((hb - 1).cast("long"), hb.cast("long"), (hb + 1).cast("long"))
        ).alias("hb"),
    )
    b = e.select(
        F.col("event_id").alias("r_id"),
        F.col("user_id").alias("r_user"),
        F.unix_micros("ts").alias("r_us"),
        hb.cast("long").alias("r_hb"),
    )
    pairs = a.join(
        b,
        (a["user_id"] == b["r_user"])
        & (a["hb"] == b["r_hb"])
        & (F.col("l_id") < F.col("r_id"))
        & (F.col("r_us") >= F.col("l_us") - 3600 * 1000000)
        & (F.col("r_us") <= F.col("l_us") + 3600 * 1000000),
    )
    return (
        pairs.groupBy((F.col("user_id") % 16).alias("ub"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.abs(F.col("r_us") - F.col("l_us")))
            .cast("bigint")
            .alias("sum_abs_us"),
            F.max(F.abs(F.col("r_us") - F.col("l_us")))
            .cast("bigint")
            .alias("max_abs_us"),
        )
        .orderBy("ub")
    )


@register(
    "x_theta_band_join",
    oracle=(
        "WITH bands(lo, hi, label) AS (VALUES "
        "(0.0, 50.0, 'low'), (50.0, 150.0, 'mid'), "
        "(150.0, 300.0, 'high'), (300.0, 1000.0, 'extreme')) "
        "SELECT b.label, count(*) AS n, "
        "CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) "
        "AS sv100 "
        "FROM events e JOIN bands b "
        "ON e.value >= b.lo AND e.value < b.hi "
        "GROUP BY b.label ORDER BY b.label"
    ),
    doc=(
        "Pure theta join (no equi component): events banded against "
        "an inline (lo, hi, label) bounds table via value >= lo AND "
        "value < hi — the join strategy surface Spark serves with "
        "BroadcastNestedLoopJoin when one side is tiny (pinned in "
        "test_plan_quality). The declared-band lookup is how routed "
        "metrics map onto histogram buckets with DATA-DRIVEN bounds "
        "— z19's static floor() bucketing can't express bands that "
        "live in a config table. Scale rule: BNLJ is O(n·bands) — "
        "fine while the bands side stays broadcast-size; for large "
        "band tables, bucketize to recover an equi key (Z11's "
        "trick)."
    ),
    tags=("joins", "theta"),
)
def x_theta_band_join(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    bands = spark.createDataFrame(
        [
            (0.0, 50.0, "low"),
            (50.0, 150.0, "mid"),
            (150.0, 300.0, "high"),
            (300.0, 1000.0, "extreme"),
        ],
        "lo double, hi double, label string",
    )
    j = e.join(
        F.broadcast(bands),
        (e["value"] >= bands["lo"]) & (e["value"] < bands["hi"]),
    )
    return (
        j.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias(
                "sv100"
            ),
        )
        .orderBy("label")
    )

"""Event-behavior analytics: funnel, retention cohorts, OHLC
downsampling, and the navigation window functions (ntile /
percent_rank / IGNORE NULLS last_value).

North-star analytics additions — the reference (a stream router) has
no counterpart; these are the standard product-analytics shapes a
pipeline downstream of the router computes. Reference tie-in: the
event stream is exactly the enriched envelope of
`src/ziggurat/streams.clj:125-132` after deserialization.

Scale shape (100 TB): every query here is a groupBy/window keyed on
user_id or (event_type, bucket) — hash-shuffled once, no driver
collects, no cross joins. The funnel is three cascaded
min-aggregates joined on user_id (co-partitioned after the first
shuffle; AQE broadcasts the shrinking stage frontiers). Cohort
retention is two user_id aggregates + one distinct — the distinct
rides the same user_id partitioning. OHLC is a single groupBy with
full map-side combine: min_by/max_by carry (value, sortkey) pairs
through the partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table

#: Funnel stage order: users must pass stages strictly in ts order.
FUNNEL_STAGES = ("view", "click", "purchase")


@register(
    "x_funnel_analysis",
    oracle=(
        "WITH v AS (SELECT user_id, min(ts) AS t1 FROM events "
        "WHERE event_type = 'view' GROUP BY user_id), "
        "c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
        "JOIN v ON v.user_id = e.user_id "
        "WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id), "
        "p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
        "JOIN c ON c.user_id = e.user_id "
        "WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id) "
        "SELECT stage, users FROM ("
        "SELECT '1_view' AS stage, count(*) AS users FROM v "
        "UNION ALL SELECT '2_click', count(*) FROM c "
        "UNION ALL SELECT '3_purchase', count(*) FROM p) f ORDER BY stage"
    ),
    doc=(
        "Ordered funnel: users whose first 'view' precedes a later "
        "'click' precedes a later 'purchase'. Three cascaded min-ts "
        "aggregates, each joined to the previous stage frontier on "
        "user_id — strictly-ordered funnel semantics without window "
        "functions or self-joins over the full event table. At scale "
        "each stage shrinks, so stages 2+ are broadcast joins "
        "against a filtered scan (AQE picks this up locally)."
    ),
    tags=("analytics", "funnel", "behavior"),
)
def x_funnel_analysis(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = [
        v.agg(F.lit("1_view").alias("stage"), F.count("*").alias("users")),
        c.agg(F.lit("2_click").alias("stage"), F.count("*").alias("users")),
        p.agg(F.lit("3_purchase").alias("stage"), F.count("*").alias("users")),
    ]
    out = rows[0].unionAll(rows[1]).unionAll(rows[2])
    return out.orderBy("stage")


@register(
    "x_retention_cohorts",
    oracle=(
        "WITH f AS (SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) "
        "AS cohort FROM events GROUP BY user_id), "
        "act AS (SELECT DISTINCT e.user_id, f.cohort, "
        "datediff('day', f.cohort, CAST(date_trunc('day', e.ts) AS DATE)) "
        "AS offset_d FROM events e JOIN f ON f.user_id = e.user_id) "
        "SELECT CAST(cohort AS VARCHAR) AS cohort, offset_d, "
        "count(*) AS users FROM act "
        "WHERE offset_d <= 7 GROUP BY cohort, offset_d "
        "ORDER BY cohort, offset_d"
    ),
    doc=(
        "Cohort retention matrix: users bucketed by first-seen day, "
        "counted per day-offset of later activity (first week). Two "
        "aggregates on user_id plus one distinct — all three ride "
        "ONE hash partitioning on user_id (no re-shuffle between the "
        "join and the distinct thanks to co-partitioning), then a "
        "small final shuffle on (cohort, offset)."
    ),
    tags=("analytics", "retention", "behavior"),
)
def x_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    # cohort is kept as a STRING on the output: a bare DATE column
    # round-trips differently through pandas depending on whether
    # Arrow conversion is enabled on the caller's session (object
    # datetime.date vs datetime64), and the driver's session is not
    # ours to configure.
    f = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort")
    )
    act = (
        e.join(f, "user_id")
        .select(
            "user_id",
            "cohort",
            F.datediff(F.to_date(F.date_trunc("day", F.col("ts"))), F.col("cohort")).alias(
                "offset_d"
            ),
        )
        .distinct()
    )
    return (
        act.filter(F.col("offset_d") <= 7)
        .groupBy(F.col("cohort").cast("string").alias("cohort"), F.col("offset_d"))
        .agg(F.count("*").alias("users"))
        .orderBy("cohort", "offset_d")
    )


#: Unique, order-preserving sort key for arg_min/arg_max tie-breaks:
#: zero-padded epoch-microseconds + event_id. String compare ==
#: (ts, event_id) compare because both fields are fixed-width.
_OHLC_KEY_DUCK = "printf('%020d#%012d', epoch_us(ts), event_id)"


@register(
    "x_ohlc_downsample",
    oracle=(
        "SELECT event_type, "
        "CAST(time_bucket(INTERVAL 6 HOUR, ts) AS VARCHAR) AS bucket, "
        f"arg_min(value, {_OHLC_KEY_DUCK}) AS open, "
        "max(value) AS high, min(value) AS low, "
        f"arg_max(value, {_OHLC_KEY_DUCK}) AS close, "
        "count(*) AS volume, "
        "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS sv_fp "
        "FROM events GROUP BY event_type, bucket ORDER BY event_type, bucket"
    ),
    doc=(
        "OHLC time-series downsampling: 6-hour bars per event_type — "
        "open/close via min_by/max_by on a zero-padded "
        "(epoch_us, event_id) string key (deterministic under ts "
        "ties), high/low/volume as plain aggregates, plus a "
        "scaled-integer sum (the x_variance_exact technique) so the "
        "hash check is bit-stable. ONE groupBy with full map-side "
        "partial aggregation — min_by carries a (value, key) pair "
        "per group through the combiner, so the shuffle moves one "
        "row per (type, bucket) per map task regardless of input "
        "size. The epoch-aligned bucket (Spark window(), DuckDB "
        "time_bucket) is the hypertable rollup primitive."
    ),
    tags=("analytics", "timeseries", "downsample"),
)
def x_ohlc_downsample(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    key = F.format_string("%020d#%012d", F.unix_micros("ts"), F.col("event_id"))
    b = e.select(
        "event_type",
        F.col("value"),
        F.window("ts", "6 hours").start.cast("string").alias("bucket"),
        key.alias("k"),
    )
    return (
        b.groupBy("event_type", "bucket")
        .agg(
            F.min_by("value", "k").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "k").alias("close"),
            F.count("*").alias("volume"),
            F.sum(F.round(F.col("value") * 1000000).cast("bigint")).alias("sv_fp"),
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "x_window_navigation",
    oracle=(
        "WITH b AS (SELECT event_id, user_id, ts, value, "
        "CASE WHEN event_type = 'error' THEN NULL ELSE value END AS nv "
        "FROM events) "
        "SELECT event_id, "
        "ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS quartile, "
        "percent_rank() OVER (PARTITION BY user_id ORDER BY value, event_id) "
        "AS pr, "
        "last_value(nv IGNORE NULLS) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_ok "
        "FROM b ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Navigation window functions: ntile(4) quartiles, "
        "percent_rank, and running last non-null (IGNORE NULLS — "
        "Spark F.last(ignorenulls=True), DuckDB last_value(x IGNORE "
        "NULLS)) forward-filling over error rows. All three windows "
        "partition by user_id — state per window is one partition's "
        "rows, never a global sort (the final ORDER BY + LIMIT is "
        "a TakeOrdered, not a full exchange)."
    ),
    tags=("window", "navigation", "functions"),
)
def x_window_navigation(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    b = e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value")).alias("nv"),
    )
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy("value", "event_id")
    w_run = w_ts.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        b.select(
            "event_id",
            F.ntile(4).over(w_ts).alias("quartile"),
            F.percent_rank().over(w_val).alias("pr"),
            F.last("nv", ignorenulls=True).over(w_run).alias("last_ok"),
        )
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "x_transition_matrix",
    oracle=(
        "WITH seq AS (SELECT user_id, event_type, "
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS prev FROM events) "
        "SELECT prev AS from_type, event_type AS to_type, "
        "count(*) AS n, "
        "CAST(count(*) * 1000000 // sum(count(*)) OVER (PARTITION BY prev) "
        "AS BIGINT) AS p_ppm "
        "FROM seq WHERE prev IS NOT NULL "
        "GROUP BY prev, event_type ORDER BY from_type, to_type"
    ),
    doc=(
        "Clickstream Markov transition matrix: for each consecutive "
        "event pair per user (one user_id window pass), the "
        "transition count and probability in integer parts-per-"
        "million (count·1e6 div row-total — engine-exact, no float "
        "division). The row-normalization rides a tiny window over "
        "the k² aggregated matrix, not the event table. One event "
        "shuffle + one k²-row window; the standard input to "
        "next-event prediction and anomaly scoring."
    ),
    tags=("behavior", "markov", "analytics"),
)
def x_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    counts = seq.groupBy(
        F.col("prev").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    return (
        counts.select(
            "from_type",
            "to_type",
            "n",
            F.expr("n * 1000000 div sum(n) OVER (PARTITION BY from_type)")
            .cast("bigint")
            .alias("p_ppm"),
        )
        .orderBy("from_type", "to_type")
    )

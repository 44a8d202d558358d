"""Time-series operators the north star names explicitly: range
(interval-containment) join and hypertable-style gap-fill rollup.

Both are spelled as compositions of existing DataFrame ops (the
(a)-path of the custom-operator ladder): the range join rides an
equi-key so it executes as a hash join with a residual range
predicate — never a nested loop over all pairs — and the gap-fill
spine is generated from data-derived bounds (no wall clock, so the
oracle hash is stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


@register(
    "x_range_join",
    oracle=(
        "WITH w AS (SELECT user_id, min(ts) AS t0, "
        "min(ts) + INTERVAL 24 HOUR AS t1 FROM events GROUP BY user_id) "
        "SELECT w.user_id, count(e.event_id) AS n_first_day, "
        "CAST(min(w.t0) AS VARCHAR) AS window_start "
        "FROM w JOIN events e ON e.user_id = w.user_id "
        "AND e.ts >= w.t0 AND e.ts < w.t1 "
        "GROUP BY w.user_id ORDER BY w.user_id"
    ),
    doc=(
        "Range (interval-containment) join: each user's first-24h "
        "window joined back to their events — equi-key (user_id) + "
        "residual range predicate, so Catalyst executes a plain "
        "shuffled/broadcast HASH join with a post-filter, never a "
        "nested loop (pinned: no CartesianProduct). This is the "
        "general recipe for range joins at 100 TB: always ride an "
        "equi-key (entity id, or a coarse time-bucket key when "
        "intervals are keyless) so the range check is residual; "
        "pure time-banded variants are the stream-join family "
        "(Z11/J1)."
    ),
    tags=("join", "range", "timeseries"),
)
def x_range_join(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = e.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        (F.min("ts") + F.expr("INTERVAL 24 HOUR")).alias("t1"),
    )
    j = w.join(
        e.select("user_id", "event_id", "ts").alias("e"),
        (F.col("e.user_id") == w.user_id)
        & (F.col("e.ts") >= F.col("t0"))
        & (F.col("e.ts") < F.col("t1")),
    )
    return (
        j.groupBy(w.user_id.alias("user_id"))
        .agg(
            F.count("event_id").alias("n_first_day"),
            F.min("t0").cast("string").alias("window_start"),
        )
        .orderBy("user_id")
    )


@register(
    "x_gap_fill",
    oracle=(
        "WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) "
        "AS d, count(*) AS n FROM events GROUP BY 1, 2), "
        "bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM daily), "
        "spine AS (SELECT t.event_type, g.d FROM "
        "(SELECT DISTINCT event_type FROM events) t "
        "CROSS JOIN (SELECT unnest(generate_series(d0, d1, "
        "INTERVAL 1 DAY))::DATE AS d FROM bounds) g), "
        "filled AS (SELECT s.event_type, s.d, coalesce(daily.n, 0) AS n, "
        "daily.n AS n_raw FROM spine s LEFT JOIN daily "
        "ON daily.event_type = s.event_type AND daily.d = s.d) "
        "SELECT event_type, CAST(d AS VARCHAR) AS day, n, "
        "CAST(coalesce(last_value(n_raw IGNORE NULLS) OVER ("
        "PARTITION BY event_type ORDER BY d "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) "
        "AS carried "
        "FROM filled ORDER BY event_type, day"
    ),
    doc=(
        "Hypertable-style gap-fill rollup: daily counts per type, "
        "densified over a generated calendar spine (data-derived "
        "bounds — no wall clock), missing days zero-filled AND "
        "forward-filled (last_value IGNORE NULLS ≡ Spark "
        "last(ignorenulls)). The spine is O(types × days) — built "
        "from a 1-row bounds aggregate + sequence(), broadcast into "
        "the left join; the window partitions by type so the fill "
        "never serializes globally. At 100 TB the daily rollup is "
        "the only big shuffle; everything after runs on the "
        "(tiny) rollup."
    ),
    tags=("timeseries", "gapfill", "window"),
)
def x_gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("d")
    ).agg(F.count("*").alias("n"))
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    types = e.select("event_type").distinct()
    spine = types.crossJoin(days)
    filled = spine.join(daily, ["event_type", "d"], "left").select(
        "event_type",
        "d",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.col("n").alias("n_raw"),
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        filled.select(
            "event_type",
            F.col("d").cast("date").cast("string").alias("day"),
            "n",
            F.coalesce(
                F.last("n_raw", ignorenulls=True).over(win), F.lit(0)
            )
            .cast("bigint")
            .alias("carried"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "x_rolling_median",
    oracle=(
        "WITH r AS (SELECT event_id, user_id, ts, "
        "CAST(round(value * 100) AS BIGINT) AS v FROM events) "
        "SELECT event_id, "
        "list_sort(list(v) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))"
        "[CAST((len(list(v) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) + 1) // 2 AS INT)] "
        "AS rolling_med "
        "FROM r ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Rolling exact median (lower median) of the centi-scaled "
        "value over each user's trailing 5 events: collect the frame, "
        "sort the (bounded, <=5-element) array JVM-side, index the "
        "middle — engine-exact integers, no percentile interpolation "
        "ambiguity. One user_id window shuffle; the per-row sort is "
        "O(k log k) on a constant k, which is the right trade "
        "whenever the frame is small and exactness matters (the "
        "sketch answer for big frames is x_approx_sketches)."
    ),
    tags=("timeseries", "window", "median"),
)
def x_rolling_median(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = e.select("event_id", F.collect_list("v").over(w).alias("arr"))
    return (
        arr.select(
            "event_id",
            F.expr(
                "element_at(array_sort(arr), "
                "CAST((size(arr) + 1) div 2 AS INT))"
            ).alias("rolling_med"),
        )
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "x_rolling_distinct",
    oracle=(
        "SELECT event_id, "
        "CAST(len(list_distinct(list(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))) AS BIGINT) "
        "AS n_distinct_types "
        "FROM events ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Rolling distinct count over each user's trailing 10 events "
        "(distinct event types seen in the recent window — the "
        "rolling-unique-visitors shape). COUNT(DISTINCT) isn't legal "
        "over a moving frame in either engine; the portable exact "
        "spelling collects the bounded frame and distincts in the "
        "array domain (JVM-side). Same single-shuffle window plan "
        "as every trailing-frame query here; at 100 TB a huge frame "
        "would swap to an HLL sketch column instead."
    ),
    tags=("timeseries", "window", "distinct"),
)
def x_rolling_distinct(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            F.size(
                F.array_distinct(F.collect_list("event_type").over(w))
            )
            .cast("bigint")
            .alias("n_distinct_types"),
        )
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "x_period_over_period",
    oracle=(
        "WITH daily AS (SELECT date_trunc('day', ts) AS d, count(*) AS n "
        "FROM events GROUP BY 1) "
        "SELECT CAST(CAST(d AS DATE) AS VARCHAR) AS day, n, "
        "n - lag(n) OVER (ORDER BY d) AS delta, "
        "CAST((n - lag(n) OVER (ORDER BY d)) * 1000000 // "
        "lag(n) OVER (ORDER BY d) AS BIGINT) AS growth_ppm "
        "FROM daily ORDER BY d"
    ),
    doc=(
        "Period-over-period growth: daily event counts with absolute "
        "delta and growth rate in integer parts-per-million (delta * "
        "1e6 div previous — engine-exact, no float division). The "
        "window runs over the AGGREGATED day series (365 rows/year), "
        "so the single-partition ORDER BY lag is safe at any input "
        "scale — the event-table shuffle is the groupBy, map-side "
        "combined. The standard WoW/DoD dashboard primitive."
    ),
    tags=("timeseries", "growth", "window"),
)
def x_period_over_period(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").alias("n")
    )
    w = Window.orderBy("d")
    prev = F.lag("n").over(w)
    return (
        daily.select(
            F.col("d").cast("date").cast("string").alias("day"),
            "n",
            (F.col("n") - prev).alias("delta"),
            F.expr(
                "CAST((n - lag(n) OVER (ORDER BY d)) * 1000000 div "
                "lag(n) OVER (ORDER BY d) AS BIGINT)"
            ).alias("growth_ppm"),
        )
        .orderBy("day")
    )


@register(
    "x_cumulative_distinct",
    oracle=(
        "WITH first_seen AS (SELECT user_id, "
        "min(date_trunc('day', ts)) AS d0 FROM events GROUP BY user_id), "
        "per_day AS (SELECT d0, count(*) AS new_users FROM first_seen "
        "GROUP BY d0) "
        "SELECT CAST(CAST(d0 AS DATE) AS VARCHAR) AS day, new_users, "
        "CAST(sum(new_users) OVER (ORDER BY d0 ROWS BETWEEN UNBOUNDED "
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS cumulative_users "
        "FROM per_day ORDER BY d0"
    ),
    doc=(
        "Cumulative distinct users per day WITHOUT a running "
        "COUNT(DISTINCT) (quadratic state): each user collapses to a "
        "first-seen day (one user_id aggregate), days aggregate to "
        "new-user counts, and the running sum over the tiny day "
        "series is the cumulative distinct — the growth-accounting "
        "identity. Two map-combined shuffles of shrinking size; the "
        "day-series window is O(days), never O(users)."
    ),
    tags=("timeseries", "distinct", "growth"),
)
def x_cumulative_distinct(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("d0")
    )
    per_day = first_seen.groupBy("d0").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("d0").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per_day.select(
            F.col("d0").cast("date").cast("string").alias("day"),
            "new_users",
            F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
        )
        .orderBy("day")
    )


@register(
    "x_time_weighted_avg",
    oracle=(
        "WITH o AS (SELECT user_id, "
        "CAST(round(value * 100) AS BIGINT) AS v, epoch_us(ts) AS t, "
        "lead(epoch_us(ts)) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS tn FROM events) "
        "SELECT user_id, wv, w, "
        "CAST(round(1000000.0 * wv / w) AS BIGINT) AS twa_c_ppm FROM ("
        "SELECT user_id, CAST(sum(v * (tn - t)) AS BIGINT) AS wv, "
        "CAST(sum(tn - t) AS BIGINT) AS w FROM o "
        "WHERE tn IS NOT NULL GROUP BY user_id) s ORDER BY user_id"
    ),
    doc=(
        "Time-weighted average per user (the TimescaleDB time_weight "
        "primitive): each observation is held until the next one, so "
        "its weight is the exact integer-microsecond gap from a "
        "single lead() — weighted numerator and denominator are pure "
        "int64 sums (DECIMAL(38,0) beyond ~1e18 µs·cents per group) "
        "and only the final ppm ratio touches floats, as one fixed "
        "IEEE expression. One shuffle on user_id serves the window "
        "AND the groupBy — the aggregation rides the window's "
        "partitioning."
    ),
    tags=("timeseries", "window", "agg"),
)
def x_time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
        F.unix_micros("ts").alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.withColumn("tn", F.lead("t").over(w)).filter(
        F.col("tn").isNotNull()
    )
    s = o.groupBy("user_id").agg(
        F.sum(F.col("v") * (F.col("tn") - F.col("t"))).alias("wv"),
        F.sum(F.col("tn") - F.col("t")).alias("w"),
    )
    twa = (F.round(F.lit(1000000.0) * F.col("wv") / F.col("w"))).cast(
        "bigint"
    )
    return s.select("user_id", "wv", "w", twa.alias("twa_c_ppm")).orderBy(
        "user_id"
    )


@register(
    "x_interval_overlap_join",
    oracle=(
        "WITH a AS (SELECT user_id, event_id, epoch_us(ts) AS s, "
        "epoch_us(ts) + 1800000000 AS e FROM events "
        "WHERE event_type = 'view'), "
        "b AS (SELECT user_id, event_id, epoch_us(ts) AS s, "
        "epoch_us(ts) + 7200000000 AS e FROM events "
        "WHERE event_type = 'purchase') "
        "SELECT a.user_id % 16 AS ub, count(*) AS n_pairs, "
        "CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT) "
        "AS overlap_us_sum "
        "FROM a JOIN b ON a.user_id = b.user_id "
        "AND a.s < b.e AND b.s < a.e AND a.event_id <> b.event_id "
        "GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "Interval OVERLAP join — the fourth temporal-join shape "
        "(after as-of, range-containment x_range_join, and the ±w "
        "band J1): view sessions [ts, ts+30m) against purchase "
        "windows [ts, ts+2h) on the same user, pairs where the "
        "intervals intersect (a.s < b.e AND b.s < a.e), graded with "
        "the exact integer-µs total overlap length — attribution's "
        "core computation ('how much viewing time fell inside a "
        "purchase window'). Spark side bucketizes like Z11: the "
        "join key carries b's start-hour bucket and a explodes only "
        "across the hours its padded interval spans, so fan-out is "
        "window-local and per-user volume never goes quadratic; "
        "each overlapping pair matches in exactly one bucket. At "
        "100 TB this is the streaming-state-sized spelling of "
        "PostgreSQL's range && operator."
    ),
    tags=("timeseries", "join", "interval"),
)
def x_interval_overlap_join(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    A_LEN = 1800 * 1000000  # 30 min in µs
    B_LEN = 7200 * 1000000  # 2 h in µs
    HOUR = 3600 * 1000000
    a_base = e.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.unix_micros("ts").alias("a_s"),
        (F.unix_micros("ts") + A_LEN).alias("a_e"),
    )
    # overlap requires b.s in (a.s - 2h, a.e): explode a across the
    # hour buckets that padded span covers (~3 buckets)
    a = a_base.select(
        "*",
        F.explode(
            F.sequence(
                ((F.col("a_s") - B_LEN) / HOUR).cast("bigint"),
                (F.col("a_e") / HOUR).cast("bigint"),
            )
        ).alias("hb"),
    )
    b = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.unix_micros("ts").alias("b_s"),
        (F.unix_micros("ts") + B_LEN).alias("b_e"),
        (F.unix_micros("ts") / HOUR).cast("bigint").alias("b_hb"),
    )
    pairs = a.join(
        b,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("hb") == F.col("b_hb"))
        & (F.col("a_s") < F.col("b_e"))
        & (F.col("b_s") < F.col("a_e"))
        & (F.col("a_id") != F.col("b_id")),
    )
    overlap = F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
    return (
        pairs.groupBy((F.col("user_id") % 16).alias("ub"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(overlap).cast("bigint").alias("overlap_us_sum"),
        )
        .orderBy("ub")
    )


@register(
    "x_max_drawdown",
    oracle=(
        "WITH s AS (SELECT user_id, ts, event_id, "
        "CAST(round(value * 100) AS BIGINT) AS v FROM events), "
        "r AS (SELECT user_id, v, "
        "max(v) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak "
        "FROM s) "
        "SELECT user_id, CAST(max(peak - v) AS BIGINT) AS max_drawdown, "
        "CAST(max(peak) AS BIGINT) AS peak_v100, count(*) AS n "
        "FROM r GROUP BY user_id ORDER BY user_id"
    ),
    doc=(
        "Maximum drawdown per user — the classic risk statistic "
        "(largest drop from a running peak), all-integer over the "
        "centi-scaled value series in (ts, event_id) order: one "
        "running-max window + one aggregate. The monitoring twin of "
        "the reference's delay histogram: 'how far below its best "
        "has this series fallen'. One user_id shuffle, one sort, "
        "O(1) window state per row; at 100 TB identical — running "
        "max needs no frame buffer."
    ),
    tags=("timeseries", "window", "risk"),
)
def x_max_drawdown(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = e.select("user_id", "v", F.max("v").over(w).alias("peak"))
    return (
        r.groupBy("user_id")
        .agg(
            F.max(F.col("peak") - F.col("v")).cast("bigint").alias(
                "max_drawdown"
            ),
            F.max("peak").cast("bigint").alias("peak_v100"),
            F.count("*").alias("n"),
        )
        .orderBy("user_id")
    )


@register(
    "x_weekly_resample",
    oracle=(
        "SELECT date_trunc('week', ts) AS week_start, "
        "count(*) AS n, "
        "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sv100, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS users "
        "FROM events GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "ISO-week resampling: date_trunc('week') (Monday start on "
        "both engines) rolls the event stream up to weekly bars with "
        "count / value sum / distinct users — the reporting "
        "granularity between z05's daily and x_ohlc_downsample's "
        "6-hourly. One map-side-combined agg; the distinct rides "
        "the same shuffle (partial sets bounded by per-week users)."
    ),
    tags=("timeseries", "calendar"),
)
def x_weekly_resample(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return (
        e.groupBy(F.date_trunc("week", "ts").alias("week_start"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias(
                "sv100"
            ),
            F.countDistinct("user_id").cast("bigint").alias("users"),
        )
        .orderBy("week_start")
    )

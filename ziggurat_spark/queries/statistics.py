"""Exact statistical-model queries: per-group OLS trend fit, Benford
first-digit profiling, and bigram lift (PMI's ratio core).

North-star analytics additions (the reference's only aggregations
are metric counters — SURVEY §2.1). All three follow the repo's
float-parity discipline: every aggregate is an integer sum (exact,
associative, order-free), and the only floating-point steps are a
FIXED expression tree over those integer totals — identical on Spark
and DuckDB, so results hash-match (see queries/aggs.py).

Scale shape (100 TB): trend fit and Benford are single-scan
map-side-combined groupBys (one shuffle each; the Benford share adds
a single-partition window over 9 rows). Bigram lift is the
x_top_bigrams explode feeding one agg shuffle, then two joins
against the unigram count table keyed on the word — co-partitioned
with AQE deciding broadcast for the (vocabulary-sized) count side —
plus two scalar totals that always broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table

_EPOCH = "2024-01-01"

#: shared integer cores (engine-neutral SQL)
_Y = "CAST(round(value * 100) AS BIGINT)"


@register(
    "x_trend_fit",
    oracle=(
        "WITH p AS (SELECT event_type, "
        f"CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) "
        f"AS BIGINT) AS x, {_Y} AS y FROM events), "
        "s AS (SELECT event_type, count(*) AS n, "
        "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, "
        "CAST(sum(x * y) AS BIGINT) AS sxy, "
        "CAST(sum(x * x) AS BIGINT) AS sxx FROM p GROUP BY event_type) "
        "SELECT event_type, n, "
        "CAST(round(1000000.0 * (n * sxy - sx * sy) / "
        "(n * sxx - sx * sx)) AS BIGINT) AS slope_ppm, "
        "CAST(round(1000000.0 * (sy * sxx - sx * sxy) / "
        "(n * sxx - sx * sx)) AS BIGINT) AS intercept_ppm "
        "FROM s ORDER BY event_type"
    ),
    doc=(
        "Per-group ordinary-least-squares fit of value against "
        "day-since-epoch, exact: the five sufficient statistics "
        "(n, Σx, Σy, Σxy, Σx²) are integer sums — order-free and "
        "mergeable, so the groupBy map-side-combines like any "
        "counter — and slope/intercept come out of one fixed IEEE "
        "expression over those totals, reported in ppm. The "
        "streaming form is the same five integers in a state store "
        "(they merge by addition), which is why OLS-by-sufficient-"
        "statistics is THE scale spelling of regression."
    ),
    tags=("statistics", "agg"),
)
def x_trend_fit(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    p = e.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date"))
        .cast("bigint")
        .alias("x"),
        F.expr(_Y).alias("y"),
    )
    s = p.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (
        F.round(
            F.lit(1000000.0)
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / den
        )
    ).cast("bigint")
    intercept = (
        F.round(
            F.lit(1000000.0)
            * (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
            / den
        )
    ).cast("bigint")
    return s.select(
        "event_type",
        "n",
        slope.alias("slope_ppm"),
        intercept.alias("intercept_ppm"),
    ).orderBy("event_type")


@register(
    "x_benford_digits",
    oracle=(
        "WITH d AS (SELECT substr(CAST(CAST(round(o_totalprice * 100) "
        "AS BIGINT) AS VARCHAR), 1, 1) AS digit FROM orders) "
        "SELECT digit, count(*) AS n, "
        "CAST(round(1000000.0 * count(*) / sum(count(*)) OVER ()) "
        "AS BIGINT) AS share_ppm "
        "FROM d GROUP BY digit ORDER BY digit"
    ),
    doc=(
        "Benford first-digit profile of order totals — the classic "
        "fraud/data-quality screen. The leading digit is taken from "
        "the STRING form of exact integer cents (never floor(log10) "
        "— transcendental-at-a-boundary is how engines disagree), "
        "so the profile is engine-exact. One map-side-combined "
        "groupBy on 9 digit values, then a single-partition window "
        "over 9 rows for the ppm share — free at any scale."
    ),
    tags=("statistics", "quality"),
)
def x_benford_digits(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    d = o.select(
        F.expr(
            "substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) "
            "AS STRING), 1, 1)"
        ).alias("digit")
    )
    agg = d.groupBy("digit").agg(F.count("*").alias("n"))
    share = (
        F.round(F.lit(1000000.0) * F.col("n") / F.sum("n").over(Window.partitionBy()))
    ).cast("bigint")
    return agg.select("digit", "n", share.alias("share_ppm")).orderBy("digit")


_MIN_BIGRAM_N = 5


@register(
    "x_bigram_lift",
    oracle=(
        "WITH w AS (SELECT unnest(string_split(text, ' ')) AS word "
        "FROM documents), "
        "u AS (SELECT word, count(*) AS nw FROM w GROUP BY word), "
        "tw AS (SELECT count(*) AS n_words FROM w), "
        "b AS (SELECT words[i] AS w1, words[i + 1] AS w2 FROM ("
        "SELECT string_split(text, ' ') AS words FROM documents) t, "
        "unnest(range(1, len(words))) AS r(i)), "
        "bc AS (SELECT w1, w2, count(*) AS nb FROM b GROUP BY w1, w2), "
        "tb AS (SELECT count(*) AS n_bigrams FROM b) "
        "SELECT bc.w1, bc.w2, bc.nb, "
        "CAST(round(1000000.0 * (bc.nb * tw.n_words * tw.n_words) / "
        "(tb.n_bigrams * u1.nw * u2.nw)) AS BIGINT) AS lift_ppm "
        "FROM bc, tw, tb "
        "JOIN u u1 ON u1.word = bc.w1 JOIN u u2 ON u2.word = bc.w2 "
        f"WHERE bc.nb >= {_MIN_BIGRAM_N} "
        "ORDER BY lift_ppm DESC, w1, w2 LIMIT 100"
    ),
    doc=(
        "Bigram lift (the ratio inside PMI, kept integer-exact): "
        "p(xy) / (p(x)·p(y)) = nb·N_w² / (N_b·n_x·n_y), reported in "
        "ppm without ever taking a log. Collocation mining: lift ≫ 1 "
        "marks word pairs that co-occur far above chance. One explode "
        "feeds both the unigram and bigram counts (two agg shuffles "
        "over token partials), the two count joins are keyed on the "
        "word (AQE broadcasts the smaller side), and the two scalar "
        "totals broadcast as single-row cross joins."
    ),
    tags=("statistics", "text", "ngram"),
)
def x_bigram_lift(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents", fan_out=True)
    words = d.select(F.explode(F.split("text", " ")).alias("word"))
    u = words.groupBy("word").agg(F.count("*").alias("nw"))
    tw = words.agg(F.count("*").alias("n_words"))
    # tokenize once per document (lambda bodies get no hoisting —
    # an inline split(text) would re-split per element, O(L²)/doc)
    pairs = (
        d.select(F.split("text", " ").alias("ws"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1), "
                    "i -> struct(ws[i-1] AS w1, ws[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    bc = pairs.groupBy("w1", "w2").agg(F.count("*").alias("nb"))
    tb = pairs.agg(F.count("*").alias("n_bigrams"))
    lift = (
        F.round(
            F.lit(1000000.0)
            * (F.col("nb") * F.col("n_words") * F.col("n_words"))
            / (F.col("n_bigrams") * F.col("u1.nw") * F.col("u2.nw"))
        )
    ).cast("bigint")
    return (
        bc.filter(F.col("nb") >= _MIN_BIGRAM_N)
        .crossJoin(F.broadcast(tw))
        .crossJoin(F.broadcast(tb))
        .join(u.alias("u1"), F.col("w1") == F.col("u1.word"))
        .join(u.alias("u2"), F.col("w2") == F.col("u2.word"))
        .select("w1", "w2", "nb", lift.alias("lift_ppm"))
        .orderBy(F.desc("lift_ppm"), "w1", "w2")
        .limit(100)
    )


@register(
    "x_anomaly_flags",
    oracle=(
        "WITH y AS (SELECT event_type, "
        f"{_Y} AS y FROM events), "
        "s AS (SELECT event_type, count(*) AS n, "
        "CAST(sum(y) AS BIGINT) AS sy, "
        "CAST(sum(y * y) AS BIGINT) AS syy FROM y GROUP BY event_type) "
        "SELECT s.event_type, s.n, "
        "CAST(sum(CASE WHEN (s.n * y.y - s.sy) * (s.n * y.y - s.sy) > "
        "4 * (s.n * s.syy - s.sy * s.sy) THEN 1 ELSE 0 END) AS BIGINT) "
        "AS anomalies "
        "FROM y JOIN s ON s.event_type = y.event_type "
        "GROUP BY s.event_type, s.n ORDER BY s.event_type"
    ),
    doc=(
        "2-sigma anomaly census per group WITHOUT floats: "
        "|y − μ| > 2σ is algebraically (n·y − Σy)² > 4(n·Σy² − (Σy)²), "
        "so the flag is pure int64 arithmetic over the two integer "
        "moments (DECIMAL(38,0) at populations beyond ~1e9 rows/group) "
        "— no sqrt, no division, no engine float drift. Plan: one "
        "moments aggregate (map-side combined), the 5-row stats table "
        "broadcast back onto the scan, one counting aggregate. Two "
        "passes over events; the streaming form keeps (n, Σy, Σy²) "
        "in a state store and flags in-flight."
    ),
    tags=("statistics", "quality", "anomaly"),
)
def x_anomaly_flags(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select(
        "event_type", F.expr(_Y).alias("y")
    )
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dev = F.col("n") * F.col("y") - F.col("sy")
    var4 = F.lit(4) * (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return (
        e.join(F.broadcast(s), "event_type")
        .groupBy("event_type", "n")
        .agg(
            F.sum(F.when(dev * dev > var4, 1).otherwise(0))
            .cast("bigint")
            .alias("anomalies")
        )
        .select("event_type", "n", "anomalies")
        .orderBy("event_type")
    )


@register(
    "x_grouped_mode",
    oracle=(
        "WITH c AS (SELECT user_id, event_type, count(*) AS n "
        "FROM events GROUP BY user_id, event_type) "
        "SELECT user_id, event_type AS mode_type, n FROM ("
        "SELECT *, row_number() OVER (PARTITION BY user_id "
        "ORDER BY n DESC, event_type) AS rn FROM c) t "
        "WHERE rn = 1 ORDER BY user_id"
    ),
    doc=(
        "Statistical mode per group with a deterministic "
        "(count DESC, value ASC) tie-break: count sub-groups, then "
        "one row_number pick per user. Both aggregations ride a "
        "single user_id shuffle (sub-group counts re-use the "
        "partitioning); state is O(groups × distinct values), "
        "map-side combined."
    ),
    tags=("statistics", "agg", "window"),
)
def x_grouped_mode(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
        .orderBy("user_id")
    )


def _lower_median_cte(src: str, val: str, out: str) -> str:
    """DuckDB CTE body: exact lower median of integer ``val`` per
    event_type — the element at 1-based position (n+1)//2 of the
    sorted sequence (no interpolation, stays in integer space)."""
    return (
        f"SELECT event_type, {val} AS {out} FROM ("
        f"SELECT event_type, {val}, row_number() OVER ("
        f"PARTITION BY event_type ORDER BY {val}) AS rn, "
        f"count(*) OVER (PARTITION BY event_type) AS cnt FROM {src}) t "
        f"WHERE rn = (cnt + 1) // 2"
    )


@register(
    "x_mad_exact",
    oracle=(
        f"WITH y AS (SELECT event_type, {_Y} AS v FROM events), "
        "med AS (" + _lower_median_cte("y", "v", "med_v") + "), "
        "dev AS (SELECT y.event_type, abs(y.v - med.med_v) AS d "
        "FROM y JOIN med ON med.event_type = y.event_type), "
        "mad AS (" + _lower_median_cte("dev", "d", "mad_v") + ") "
        "SELECT med.event_type, med.med_v, mad.mad_v "
        "FROM med JOIN mad ON mad.event_type = med.event_type "
        "ORDER BY med.event_type"
    ),
    doc=(
        "Exact median absolute deviation per group — the robust "
        "dispersion statistic. Lower-median convention keeps every "
        "step in integer space (no even-count interpolation, no "
        "floats anywhere): one windowed rank pass picks the median, "
        "deviations join back on the (broadcastable) 5-row median "
        "table, a second rank pass picks the MAD. Scale note: the "
        "5-value group key collapses each rank pass to ≤5 tasks — "
        "fine here, but at 100 TB per-group exact medians use the "
        "distributed-rank spelling x_equidepth_histogram "
        "demonstrates (range-partition WITHIN each group + "
        "partition-count offsets), or the approx_percentile sketch "
        "path (x_approx_sketches); this is their exact oracle "
        "counterpart."
    ),
    tags=("statistics", "robust", "window"),
)
def x_mad_exact(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select(
        "event_type", F.expr(_Y).alias("v")
    )

    def lower_median(df: DataFrame, val: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(val)
        wc = Window.partitionBy("event_type")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .withColumn("cnt", F.count("*").over(wc))
            .filter(F.col("rn") == F.expr("(cnt + 1) div 2"))
            .select("event_type", F.col(val).alias(out))
        )

    med = lower_median(e, "v", "med_v")
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("v") - F.col("med_v")).alias("d")
    )
    mad = lower_median(dev, "d", "mad_v")
    return (
        med.join(mad, "event_type")
        .select("event_type", "med_v", "mad_v")
        .orderBy("event_type")
    )


#: ntile(10) closed form — the first n%10 buckets take one extra
#: row; when q = 0 (n < 10) the first branch covers every rank, so
#: the q divisor is never 0 in practice. Property-tested in
#: tests/test_properties.py against the bucket-sizes definition.
NTILE10_BUCKET_SQL = (
    "CASE WHEN rank <= (n_total % 10) * (n_total div 10 + 1) "
    "THEN (rank - 1) div (n_total div 10 + 1) + 1 "
    "ELSE (n_total % 10) + "
    "(rank - (n_total % 10) * (n_total div 10 + 1) - 1) "
    "div greatest(n_total div 10, 1) + 1 END"
)


@register(
    "x_equidepth_histogram",
    oracle=(
        f"WITH y AS (SELECT {_Y} AS v, event_id FROM events), "
        "b AS (SELECT v, ntile(10) OVER (ORDER BY v, event_id) AS bucket "
        "FROM y) "
        "SELECT bucket, count(*) AS n, min(v) AS lo, max(v) AS hi "
        "FROM b GROUP BY bucket ORDER BY bucket"
    ),
    doc=(
        "Equi-depth (quantile-bucket) histogram — the complement of "
        "z19's equi-width buckets and the shape optimizers build for "
        "selectivity estimation. The oracle spells it ntile(10) over "
        "a total order; the ENGINE computes the identical buckets "
        "with a DISTRIBUTED global rank: range-partition on the "
        "(v, event_id) total order, per-partition row_number + "
        "partition-count offsets (the classic parallel ranking), "
        "then ntile's closed form — the first r buckets of size "
        "q+1, the rest q, with q = n div 10, r = n mod 10. A bare "
        "global-window ntile would move the whole table into ONE "
        "task's sort (WindowExec warns exactly this); here every "
        "stage is partition-parallel. Exact at any scale; the "
        "sketch alternative (approx_percentile bounds + range "
        "counts) trades exactness for one fewer pass."
    ),
    tags=("statistics", "histogram", "window"),
)
def x_equidepth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.functions.ranking import global_rank

    e = load_table(spark, sf, "events").select(
        F.expr(_Y).alias("v"), "event_id"
    )
    ranked, parts = global_rank(e, ["v", "event_id"], out_col="rank")
    total = parts.agg(F.count("*").alias("n_total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("bucket", F.expr(NTILE10_BUCKET_SQL).cast("int"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .orderBy("bucket")
    )

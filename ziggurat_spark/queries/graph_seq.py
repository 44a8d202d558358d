"""Graph / sequence / mutation analytics: fixed-iteration PageRank,
MERGE-style upsert, SCD2 dimension history, ordered sequence-pattern
matching, and an exact EWMA.

North-star analytics additions (the reference is a stream router with
no analytics surface; these are the standard shapes computed over the
routed event stream downstream). Reference tie-in: the event stream is
the enriched envelope of `src/ziggurat/streams.clj:125-132`; the
upsert models what a sink table compaction job does with the routed
output.

Determinism strategy: every query here is engine-exact — PageRank and
EWMA run on scaled BIGINTs with integer division (`div` truncation ==
floor for the non-negative values involved), so map-side combines,
shuffle order and DuckDB's HUGEINT sums all produce bit-identical
results.

Scale shape (100 TB): PageRank is the classic join-agg loop — edges
are checkpointed once and reused; each iteration is one shuffle on
dst (ranks are tiny next to edges; AQE broadcasts them when they fit).
The upsert is one full-outer join on the key — at scale this is the
bucketed-merge pattern. SCD2/sequence/EWMA are single user_id window
shuffles; EWMA's weighted frame is a window collect + JVM lambda fold,
not a self-join, so it costs one sort, zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ziggurat_spark.queries.registry import register
from ziggurat_spark.scratch import release_checkpoint
from ziggurat_spark.tables import load_table

#: PageRank fixed-point scale: rank 1.0 == 1_000_000.
PR_SCALE = 1_000_000
#: Damping factor 0.85 expressed as integer percent.
PR_DAMP_PCT = 85
PR_ITERS = 3

_PAGERANK_ORACLE = (
    "WITH seq AS (SELECT user_id, event_type, "
    "lag(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev "
    "FROM events), "
    "edges AS (SELECT prev AS src, user_id AS dst FROM seq "
    "WHERE prev IS NOT NULL AND prev <> user_id), "
    "nodes AS (SELECT DISTINCT user_id AS id FROM events), "
    "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src), "
    "r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes), "
    + "".join(
        f"c{i} AS (SELECT e.dst AS id, "
        f"CAST(sum(r{i - 1}.r // deg.d) AS BIGINT) AS s "
        f"FROM edges e JOIN r{i - 1} ON r{i - 1}.id = e.src "
        f"JOIN deg ON deg.src = e.src GROUP BY e.dst), "
        f"r{i} AS (SELECT n.id, CAST(150000 + "
        f"(85 * COALESCE(c{i}.s, 0)) // 100 AS BIGINT) AS r "
        f"FROM nodes n LEFT JOIN c{i} ON c{i}.id = n.id), "
        for i in range(1, PR_ITERS + 1)
    )
    + f"final AS (SELECT id, r FROM r{PR_ITERS}) "
    "SELECT id AS user_id, r AS rank_scaled FROM final "
    "ORDER BY rank_scaled DESC, user_id LIMIT 100"
)


@register(
    "x_pagerank",
    oracle=_PAGERANK_ORACLE,
    doc=(
        "Fixed-iteration (3) PageRank over the user-interaction "
        "graph: an edge a→b wherever b's event directly follows a's "
        "in the same event_type stream. Integer fixed-point "
        "arithmetic (rank 1.0 = 1e6, damping 85/100, `div` "
        "truncation) makes every iteration bit-exact on any engine "
        "at any parallelism — the distributed-safe spelling of the "
        "classic iterative join-agg. Edges/degrees are checkpointed "
        "once; each iteration shuffles contributions on dst only."
    ),
    tags=("graph", "iterative", "analytics"),
)
def x_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", F.lag("user_id").over(w).alias("prev")
    )
    edges = (
        seq.filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("user_id")))
        .select(F.col("prev").alias("src"), F.col("user_id").alias("dst"))
        .localCheckpoint(eager=True)
    )
    nodes = e.select(F.col("user_id").alias("id")).distinct().localCheckpoint(
        eager=True
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d")).localCheckpoint(
        eager=True
    )
    ranks = nodes.select("id", F.lit(PR_SCALE).cast("bigint").alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.id)
            .join(deg, "src")
            .select(F.col("dst").alias("id"), F.expr("r div d").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        prev = ranks
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(PR_SCALE * (100 - PR_DAMP_PCT) // 100)
                    + F.expr(f"({PR_DAMP_PCT} * coalesce(s, 0L)) div 100")
                )
                .cast("bigint")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
        # release the superseded iteration's checkpoint (bounds
        # pinned state to 2 copies regardless of iteration count)
        release_checkpoint(prev)
    return (
        ranks.select(F.col("id").alias("user_id"), F.col("r").alias("rank_scaled"))
        .orderBy(F.desc("rank_scaled"), "user_id")
        .limit(100)
    )


@register(
    "x_merge_upsert",
    oracle=(
        "WITH source AS ("
        "SELECT o_orderkey AS k, 'U' AS status, o_orderpriority AS prio "
        "FROM orders WHERE o_orderkey % 97 = 0 "
        "UNION ALL "
        "SELECT -o_orderkey AS k, 'N' AS status, '9-MERGED' AS prio "
        "FROM orders WHERE o_orderkey % 101 = 0), "
        "merged AS (SELECT "
        "COALESCE(t.o_orderkey, s.k) AS o_orderkey, "
        "COALESCE(s.status, t.o_orderstatus) AS o_orderstatus, "
        "COALESCE(s.prio, t.o_orderpriority) AS o_orderpriority "
        "FROM orders t FULL OUTER JOIN source s ON s.k = t.o_orderkey) "
        "SELECT o_orderstatus, o_orderpriority, count(*) AS n, "
        "CAST(sum(o_orderkey) AS BIGINT) AS key_checksum FROM merged "
        "GROUP BY o_orderstatus, o_orderpriority "
        "ORDER BY o_orderstatus, o_orderpriority"
    ),
    doc=(
        "MERGE INTO emulation (upsert without Delta): a change-set "
        "with matched-update rows (status→'U' for keys % 97 = 0) and "
        "not-matched-insert rows (negated keys % 101 = 0) is applied "
        "to `orders` via one full-outer join on the key + COALESCE "
        "per column — WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED "
        "THEN INSERT as pure relational algebra. Output is the "
        "post-merge per-status tally with a key checksum. At scale "
        "this runs as a bucketed sort-merge join (the standard "
        "compaction shape); the change-set side broadcasts when "
        "small."
    ),
    tags=("mutation", "upsert", "join"),
)
def x_merge_upsert(spark: SparkSession, sf: str) -> DataFrame:
    t = load_table(spark, sf, "orders")
    upd = t.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.lit("U").alias("status"),
        F.col("o_orderpriority").alias("prio"),
    )
    ins = t.filter(F.col("o_orderkey") % 101 == 0).select(
        (-F.col("o_orderkey")).alias("k"),
        F.lit("N").alias("status"),
        F.lit("9-MERGED").alias("prio"),
    )
    source = upd.unionAll(ins)
    merged = t.join(source, t.o_orderkey == source.k, "full_outer").select(
        F.coalesce(t.o_orderkey, source.k).alias("o_orderkey"),
        F.coalesce(source.status, t.o_orderstatus).alias("o_orderstatus"),
        F.coalesce(source.prio, t.o_orderpriority).alias("o_orderpriority"),
    )
    return (
        merged.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").alias("key_checksum"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@register(
    "x_scd2_history",
    oracle=(
        "WITH changes AS ("
        "SELECT user_id, event_type, ts, event_id, "
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS prev_type FROM events), "
        "points AS (SELECT user_id, event_type, ts FROM changes "
        "WHERE prev_type IS NULL OR prev_type <> event_type) "
        "SELECT user_id, event_type, ts AS valid_from, "
        "lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to, "
        "CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) "
        "AS version "
        "FROM points ORDER BY user_id, version LIMIT 5000"
    ),
    doc=(
        "Slowly-changing-dimension type 2 from the event stream: "
        "change-points of event_type per user become versioned "
        "validity intervals — valid_from = change ts, valid_to = "
        "next change (NULL = current row). Two stacked user_id "
        "windows (lag to find change-points, lead/row_number to "
        "close intervals) — one shuffle, both windows ride the same "
        "partitioning. The standard dimension-history build a "
        "routed-stream consumer materializes."
    ),
    tags=("scd2", "window", "analytics"),
)
def x_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.select(
        "user_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    points = changes.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    return (
        points.select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w2).alias("valid_to"),
            F.row_number().over(w2).cast("bigint").alias("version"),
        )
        .orderBy("user_id", "version")
        .limit(5000)
    )


@register(
    "x_sequence_pattern",
    oracle=(
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
        "position('>view>click>purchase>' IN "
        "'>' || string_agg(event_type, '>' ORDER BY ts, event_id) || '>') > 0 "
        "AS direct_funnel "
        "FROM events GROUP BY user_id ORDER BY user_id LIMIT 5000"
    ),
    doc=(
        "MATCH_RECOGNIZE-style contiguous sequence matching: each "
        "user's ordered event-type sequence is serialized "
        "('view>click>...') and scanned for the contiguous "
        "view→click→purchase pattern (delimiter-framed so tokens "
        "can't false-match substrings). Spark side builds each "
        "user's ordered sequence ONCE via hash-aggregated "
        "collect_list(struct(ts, event_id, type)) + array_sort — "
        "one user_id shuffle with map-side partials and one array "
        "per user. (A full-frame window collect_list would copy the "
        "whole m-element array onto every one of the user's m rows "
        "before keeping one — O(m²) bytes per user, fatal for a "
        "million-event user.) Pattern scan is a JVM-side string "
        "search."
    ),
    tags=("sequence", "pattern", "analytics"),
)
def x_sequence_pattern(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    per_user = e.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, "
            "event_type))), r -> r.event_type)"
        ).alias("seq_arr")
    )
    return (
        per_user
        .select(
            "user_id",
            F.size("seq_arr").cast("bigint").alias("n_events"),
            (
                F.instr(
                    F.concat(
                        F.lit(">"), F.array_join("seq_arr", ">"), F.lit(">")
                    ),
                    ">view>click>purchase>",
                )
                > 0
            ).alias("direct_funnel"),
        )
        .orderBy("user_id")
        .limit(5000)
    )


@register(
    "x_ewma_exact",
    oracle=(
        "WITH r AS (SELECT event_id, user_id, ts, "
        "CAST(round(value * 100) AS BIGINT) AS v, "
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn "
        "FROM events) "
        "SELECT a.event_id, "
        "CAST(sum(b.v * (CAST(1 AS BIGINT) << CAST(7 - (a.rn - b.rn) AS INT))) "
        "// sum(CAST(1 AS BIGINT) << CAST(7 - (a.rn - b.rn) AS INT)) AS BIGINT) "
        "AS ewma_scaled "
        "FROM r a JOIN r b ON b.user_id = a.user_id "
        "AND b.rn BETWEEN a.rn - 7 AND a.rn "
        "GROUP BY a.event_id ORDER BY a.event_id LIMIT 5000"
    ),
    doc=(
        "Exponentially-weighted moving average (alpha = 1/2, last 8 "
        "events per user) in exact integer arithmetic: weights are "
        "powers of two over the centi-scaled value, so numerator/"
        "denominator are BIGINT sums and one truncating division — "
        "bit-identical across engines and shuffle orders. Spark side "
        "avoids the oracle's self-join entirely: an 8-row window "
        "collect_list + a JVM lambda fold (zip_with/aggregate) "
        "computes the weighted sum in one pass over one user_id "
        "sort — no second shuffle, no join state."
    ),
    tags=("timeseries", "window", "ewma"),
)
def x_ewma_exact(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, Window.currentRow)
    )
    arr = e.select("event_id", F.collect_list("v").over(w).alias("arr"))
    # weight for position i (0-based, oldest first) in a frame of n:
    # 2^(7 - (n - 1 - i)); fold both sums JVM-side via higher-order fns.
    num = (
        "aggregate(zip_with(arr, sequence(size(arr) - 1, 0, -1), "
        "(x, p) -> x * shiftleft(CAST(1 AS BIGINT), 7 - p)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    den = (
        "aggregate(transform(sequence(size(arr) - 1, 0, -1), "
        "p -> shiftleft(CAST(1 AS BIGINT), 7 - p)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return (
        arr.select(
            "event_id",
            F.expr(f"CAST(({num}) div ({den}) AS BIGINT)").alias("ewma_scaled"),
        )
        .orderBy("event_id")
        .limit(5000)
    )


@register(
    "x_scd2_point_lookup",
    oracle=(
        "WITH changes AS ("
        "SELECT user_id, event_type, ts, "
        "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS prev_type FROM events), "
        "dim AS (SELECT user_id, event_type, ts AS valid_from, "
        "lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to "
        "FROM changes WHERE prev_type IS NULL OR prev_type <> event_type), "
        "probes AS (SELECT unnest(["
        "TIMESTAMP '2024-01-10 00:00:00', "
        "TIMESTAMP '2024-01-20 00:00:00', "
        "TIMESTAMP '2024-01-30 00:00:00']) AS at_ts) "
        "SELECT p.at_ts, d.event_type AS state, "
        "count(*) AS n_users, CAST(sum(d.user_id) AS BIGINT) AS user_sum "
        "FROM probes p JOIN dim d ON d.valid_from <= p.at_ts "
        "AND (d.valid_to IS NULL OR d.valid_to > p.at_ts) "
        "GROUP BY p.at_ts, d.event_type ORDER BY p.at_ts, state"
    ),
    doc=(
        "Point-in-time (temporal) lookup against the SCD2 dimension "
        "x_scd2_history builds: 'what state was every user in AT "
        "time T' for three report dates — the query every type-2 "
        "dimension exists to answer, and the batch twin of a "
        "temporal table join. Interval predicate: valid_from <= T < "
        "valid_to (NULL = current). Exactly one version matches per "
        "(user, T) by construction, so the per-date user_sum "
        "checksum doubles as a no-overlap audit of the dimension "
        "build itself. Plan: the dim build is one user_id shuffle "
        "(two stacked windows); the probe join is 3 broadcast "
        "literals against the dim scan; the aggregate collapses to "
        "≤15 groups map-side. At 100 TB the dim is materialized "
        "once and the same lookup rides its storage."
    ),
    tags=("scd2", "temporal", "join"),
)
def x_scd2_point_lookup(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.select(
        "user_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    dim = changes.filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    ).select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )
    probes = spark.createDataFrame(
        [("2024-01-10",), ("2024-01-20",), ("2024-01-30",)], "d string"
    ).select(F.to_timestamp("d").alias("at_ts"))
    j = dim.join(
        F.broadcast(probes),
        (F.col("valid_from") <= F.col("at_ts"))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("at_ts"))),
    )
    return (
        j.groupBy("at_ts", F.col("event_type").alias("state"))
        .agg(
            F.count("*").alias("n_users"),
            F.sum("user_id").cast("bigint").alias("user_sum"),
        )
        .orderBy("at_ts", "state")
    )

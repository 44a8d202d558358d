"""Data-quality / pipeline-hygiene family: single-scan column
profiling, referential-integrity audit, text canonicalization, a
bucketed (exchange-free) co-located join, and the approximate-sketch
surface.

North-star additions: these are the hygiene passes a 100 TB training
-data pipeline runs before/after the routed stream lands (the
reference itself only counts messages — `metrics.clj:82-111`; a real
deployment profiles and audits the landed tables downstream).

Scale shape: profiling is ONE scan (the multi-distinct Expand trades
a bounded row inflation for single-pass I/O — at 100 TB the scan is
the cost, not the Expand). The audit is k left-anti joins where every
parent side is a dimension — all broadcast, zero shuffles of the fact
table. The bucketed join materializes both sides bucketed on the key
once, then joins with NO Exchange — the co-located join pattern that
turns every subsequent key-join/agg into a map-side operation
(pinned in tests/test_plan_quality.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table

#: events columns profiled: (name, is_numeric, scaled-int expression)
_PROFILE_COLS = (
    ("event_id", "event_id"),
    ("user_id", "user_id"),
    ("value", "CAST(round(value * 100) AS BIGINT)"),
)
_PROFILE_STR_COLS = ("event_type", "props")


@register(
    "x_profile_stats",
    oracle=(
        " UNION ALL ".join(
            f"SELECT '{name}' AS col, count(*) AS n_rows, "
            f"count(*) - count({expr}) AS n_null, "
            f"count(DISTINCT {expr}) AS n_distinct, "
            f"min({expr}) AS min_i, max({expr}) AS max_i, "
            f"CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s "
            f"FROM events"
            for name, expr in _PROFILE_COLS
        )
        + " UNION ALL "
        + " UNION ALL ".join(
            f"SELECT '{name}', count(*), count(*) - count({name}), "
            f"count(DISTINCT {name}), CAST(NULL AS BIGINT), "
            f"CAST(NULL AS BIGINT), min({name}), max({name}) FROM events"
            for name in _PROFILE_STR_COLS
        )
        + " ORDER BY col"
    ),
    doc=(
        "Single-scan data profiling of the events table: per column "
        "row/null/distinct counts plus min/max (scaled-BIGINT for "
        "numerics — engine-exact; raw strings for text). The Spark "
        "spelling computes every metric in ONE aggregate over one "
        "scan (the multi-count-distinct Expand inflates rows k×, but "
        "at 100 TB the scan dominates and one pass beats k) and "
        "unpivots with stack(). The oracle's UNION-ALL spelling "
        "reads k times — the plan-quality test pins that ours "
        "doesn't."
    ),
    tags=("profiling", "quality", "agg"),
)
def x_profile_stats(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    aggs = []
    for name, expr in _PROFILE_COLS:
        c = F.expr(expr)
        aggs += [
            F.count("*").alias(f"{name}__n"),
            (F.count("*") - F.count(c)).alias(f"{name}__nn"),
            F.countDistinct(c).alias(f"{name}__nd"),
            F.min(c).alias(f"{name}__mini"),
            F.max(c).alias(f"{name}__maxi"),
        ]
    for name in _PROFILE_STR_COLS:
        c = F.col(name)
        aggs += [
            F.count("*").alias(f"{name}__n"),
            (F.count("*") - F.count(c)).alias(f"{name}__nn"),
            F.countDistinct(c).alias(f"{name}__nd"),
            F.min(c).alias(f"{name}__mins"),
            F.max(c).alias(f"{name}__maxs"),
        ]
    wide = e.agg(*aggs)
    stack_rows = []
    for name, _ in _PROFILE_COLS:
        stack_rows.append(
            f"'{name}', {name}__n, {name}__nn, {name}__nd, "
            f"{name}__mini, {name}__maxi, CAST(NULL AS STRING), "
            f"CAST(NULL AS STRING)"
        )
    for name in _PROFILE_STR_COLS:
        stack_rows.append(
            f"'{name}', {name}__n, {name}__nn, {name}__nd, "
            f"CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), "
            f"{name}__mins, {name}__maxs"
        )
    k = len(stack_rows)
    return wide.selectExpr(
        f"stack({k}, {', '.join(stack_rows)}) AS "
        "(col, n_rows, n_null, n_distinct, min_i, max_i, min_s, max_s)"
    ).orderBy("col")


#: (edge label, child table, child key, parent table, parent key)
_FK_EDGES = (
    ("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.order", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
)


@register(
    "x_referential_audit",
    oracle=(
        " UNION ALL ".join(
            f"SELECT '{label}' AS edge, "
            f"(SELECT count(*) FROM {child}) AS n_child, "
            f"(SELECT count(*) FROM {child} c WHERE NOT EXISTS "
            f"(SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) AS n_orphan "
            for label, child, ck, parent, pk in _FK_EDGES
        )
        + " ORDER BY edge"
    ),
    doc=(
        "Referential-integrity audit across every FK edge of the "
        "star schema: per edge, child cardinality and orphan count "
        "(children whose key has no parent). Spark spelling is one "
        "left-anti join per edge — every parent side is a dimension "
        "or key-projection small enough to broadcast, so the fact "
        "tables are never shuffled; the oracle's NOT EXISTS "
        "decorrelates to the same anti-join. The standard pre-flight "
        "check before training-data joins are trusted."
    ),
    tags=("quality", "audit", "join"),
)
def x_referential_audit(spark: SparkSession, sf: str) -> DataFrame:
    parts = []
    for label, child, ck, parent, pk in _FK_EDGES:
        c = load_table(spark, sf, child)
        p = load_table(spark, sf, parent).select(pk)
        # hint only the provably-bounded parents (nation: 25 rows,
        # region: 5); customer/part/supplier/orders key projections
        # grow with the data — the planner's size statistics (static
        # or AQE) pick broadcast vs shuffled anti-join for those
        if parent in ("nation", "region"):
            p = F.broadcast(p)
        orphans = c.join(
            p, c[ck] == p[pk], "left_anti"
        ).agg(F.count("*").alias("n_orphan"))
        total = c.agg(F.count("*").alias("n_child"))
        parts.append(
            total.crossJoin(orphans).select(
                F.lit(label).alias("edge"), "n_child", "n_orphan"
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionAll(pdf)
    return out.orderBy("edge")


@register(
    "x_text_normalize",
    oracle=(
        "WITH norm AS (SELECT doc_id, "
        "trim(regexp_replace(regexp_replace(lower(text), "
        "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text "
        "FROM documents), "
        "grouped AS (SELECT norm_text, count(*) AS cnt, "
        "min(doc_id) AS keeper FROM norm GROUP BY norm_text) "
        "SELECT CAST(count(*) AS BIGINT) AS n_norm_distinct, "
        "CAST(sum(cnt) AS BIGINT) AS n_docs, "
        "CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_dupe_groups, "
        "CAST(sum(CASE WHEN cnt > 1 THEN cnt - 1 ELSE 0 END) AS BIGINT) "
        "AS n_redundant, CAST(sum(keeper) AS BIGINT) AS keeper_checksum "
        "FROM grouped"
    ),
    doc=(
        "Text canonicalization before dedup: lowercase, strip "
        "non-alphanumerics, collapse whitespace — then group by the "
        "normalized form to count exact-after-normalization "
        "duplicates and elect min-doc_id keepers (checksummed). The "
        "regex subset used ([^a-z0-9 ], ' +') behaves identically "
        "under Java regex and RE2, so results are engine-exact. One "
        "scan + one shuffle on the normalized key; at 100 TB hash "
        "the normalized text first (content-hash groupBy) so the "
        "shuffle moves 16-byte digests, not documents — the "
        "x_content_hash_dedup pattern."
    ),
    tags=("text", "dedup", "quality"),
)
def x_text_normalize(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    norm = d.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
                " +",
                " ",
            )
        ).alias("norm_text"),
    )
    grouped = norm.groupBy("norm_text").agg(
        F.count("*").alias("cnt"), F.min("doc_id").alias("keeper")
    )
    return grouped.agg(
        F.count("*").cast("bigint").alias("n_norm_distinct"),
        F.sum("cnt").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dupe_groups"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") - 1).otherwise(0))
        .cast("bigint")
        .alias("n_redundant"),
        F.sum("keeper").cast("bigint").alias("keeper_checksum"),
    )


@register(
    "x_bucketed_join",
    oracle=(
        "SELECT c.c_mktsegment, count(*) AS n, "
        "CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS cents "
        "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
        "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"
    ),
    doc=(
        "Co-located join via bucketing: both sides are materialized "
        "bucketBy(8, custkey) + sortBy once, then joined with ZERO "
        "Exchange on either side (pinned) — the bucket layout IS the "
        "shuffle, paid once at write time and amortized over every "
        "subsequent key-join/agg. This is the 100 TB answer for "
        "fact-to-fact joins that AQE can't broadcast: at cluster "
        "scale the same bucketed layout co-locates a petabyte join "
        "with no network phase. Results identical to the plain join "
        "(the oracle runs the unbucketed spelling)."
    ),
    tags=("join", "bucketing", "layout"),
)
def x_bucketed_join(spark: SparkSession, sf: str) -> DataFrame:
    import hashlib
    import tempfile

    tag = hashlib.md5(sf.encode()).hexdigest()[:8]
    base = f"{tempfile.gettempdir()}/zs_bucketed_{tag}"
    names = {}
    for table, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        tname = f"zs_{table}_b_{tag}"
        names[table] = tname
        if not spark.catalog.tableExists(tname):
            (
                load_table(spark, sf, table)
                .repartition(8, F.col(key))
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", f"{base}/{table}")
                .mode("overwrite")
                .saveAsTable(tname)
            )
    o = spark.table(names["orders"])
    c = spark.table(names["customer"])
    return (
        o.join(c, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("cents"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "x_approx_sketches",
    oracle=None,  # sketch internals are engine-specific; rows-only check
    doc=(
        "The approximate surface for interactive scale: HyperLogLog++ "
        "distinct (approx_count_distinct) and quantile sketch "
        "(approx_percentile p50/p90/p99) next to their exact "
        "counterparts. Sketches are the 100 TB default — mergeable, "
        "bounded-memory, one pass, no giant shuffle — and the exact "
        "columns let a reader see the error at test scale. "
        "Engine-specific sketch internals mean no cross-engine hash "
        "(rows-only check, by design)."
    ),
    tags=("approx", "sketch", "agg"),
)
def x_approx_sketches(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return e.agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.expr(
            "approx_percentile(value, array(0.5, 0.9, 0.99))"
        ).alias("value_pcts"),
        # exact percentile deliberately omitted: it materializes every
        # value in one final merge (the anti-pattern sketches exist to
        # avoid); exact_users beside approx_users already shows the
        # sketch error at test scale (x_quantiles has exact medians).
    )


K_ANON = 5


@register(
    "x_k_anonymity_audit",
    oracle=(
        "WITH g AS (SELECT lang, source, CAST(count(*) AS BIGINT)"
        " AS group_n FROM documents GROUP BY lang, source) "
        f"SELECT lang, source, group_n, "
        f"CASE WHEN group_n >= {K_ANON} THEN 1 ELSE 0 END AS k_anonymous "
        f"FROM g ORDER BY lang, source"
    ),
    doc=(
        "k-anonymity audit over the quasi-identifier combination "
        "(lang, source): any equivalence class smaller than k = 5 is "
        "flagged — the data-governance check run before releasing a "
        "corpus with joined metadata, because small classes "
        "re-identify their members. One map-side-collapsing groupBy; "
        "output bounded by the distinct QI combinations."
    ),
    tags=("quality", "audit", "privacy"),
)
def x_k_anonymity_audit(spark: SparkSession, sf: str) -> DataFrame:
    g = (
        load_table(spark, sf, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("bigint").alias("group_n"))
    )
    return g.select(
        "lang",
        "source",
        "group_n",
        F.when(F.col("group_n") >= K_ANON, 1)
        .otherwise(0)
        .cast("int")
        .alias("k_anonymous"),
    ).orderBy("lang", "source")

"""Second function-surface pack: ordered-argument aggregates,
ordered string aggregation, bitwise/boolean aggregates, higher-order
array functions, and generator-with-ordinality — the remaining
everyday expression surface a user would expect from an engine that
claims full query capability (SURVEY §2.2 "Registered beyond
Z01–Z28").

All five stay JVM-side (no Python in the plan): the aggregates are
hash-aggregate with map-side partials, the higher-order lambdas run
inside codegen, and the generator is a Generate node over one scan.
Tie-breaking everywhere is via a composite BIGINT ordering key that
embeds the unique event_id, so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table

# value ∈ [0, ~600] across sfs → v100 ≤ ~60_000; okey = v100·1e11 +
# event_id is unique (event_id ≪ 1e11) and fits BIGINT with ~3
# orders of headroom.
_OKEY_SQL = "CAST(round(value * 100) AS BIGINT) * 100000000000 + event_id"


@register(
    "x_argminmax",
    oracle=(
        "SELECT event_type, "
        "arg_max(event_id, okey) AS max_id, "
        "arg_min(event_id, okey) AS min_id, "
        "CAST(max(okey) // 100000000000 AS BIGINT) AS max_v100 "
        "FROM (SELECT event_type, event_id, "
        f"{_OKEY_SQL} AS okey FROM events) s "
        "GROUP BY event_type ORDER BY event_type"
    ),
    doc=(
        "Ordered-argument aggregates: max_by/min_by (DuckDB "
        "arg_max/arg_min) — 'which record had the extreme value', the "
        "aggregate form of the dead-set peek (R7, LIMIT-by-order). "
        "Ties are impossible because the ordering key embeds the "
        "unique event_id. Hash aggregate with map-side partials: one "
        "shuffle of (event_type → 2 bigints), independent of row "
        "count — survives 100 TB trivially."
    ),
    tags=("functions", "agg"),
)
def x_argminmax(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").withColumn("okey", F.expr(_OKEY_SQL))
    return (
        e.groupBy("event_type")
        .agg(
            F.expr("max_by(event_id, okey)").alias("max_id"),
            F.expr("min_by(event_id, okey)").alias("min_id"),
            (F.max("okey") / F.lit(100000000000))
            .cast("bigint")
            .alias("max_v100"),
        )
        .orderBy("event_type")
    )


@register(
    "x_string_agg",
    oracle=(
        "SELECT lang, count(*) AS n, "
        "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS ids "
        "FROM documents GROUP BY lang ORDER BY lang"
    ),
    doc=(
        "Ordered string aggregation (LISTAGG): Spark spells it "
        "array_sort(collect_list) → transform(cast) → array_join, "
        "DuckDB as string_agg(… ORDER BY …) — same deterministic "
        "output. collect_list order is undefined under parallelism, "
        "so the sort AFTER collection is what makes this "
        "cluster-safe. Per-group payload is bounded by group "
        "cardinality (languages), not table size; at 100 TB you'd "
        "cap or sketch unbounded groups instead."
    ),
    tags=("functions", "agg", "string"),
)
def x_string_agg(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    ids = F.array_join(
        F.transform(
            F.array_sort(F.collect_list("doc_id")), lambda x: x.cast("string")
        ),
        ",",
    )
    return (
        d.groupBy("lang")
        .agg(F.count("*").alias("n"), ids.alias("ids"))
        .orderBy("lang")
    )


@register(
    "x_bit_bool_aggregates",
    oracle=(
        "SELECT event_type, "
        "bit_and(m) AS ba, bit_or(m) AS bo, bit_xor(m) AS bx, "
        "bool_and(value > 0.5) AS all_hi, bool_or(value > 99.5) AS any_top "
        "FROM (SELECT event_type, value, event_id % 4096 AS m FROM events) s "
        "GROUP BY event_type ORDER BY event_type"
    ),
    doc=(
        "Bitwise and boolean aggregates: bit_and/bit_or/bit_xor over "
        "a 12-bit field plus bool_and/bool_or (every/any) — the "
        "flag-accumulation shapes of metrics tallies "
        "(consumer_handler.clj:59-65 success/skip/retry rollups as "
        "bitmasks). All are associative+commutative → map-side "
        "partials, one tiny shuffle."
    ),
    tags=("functions", "agg", "bitwise"),
)
def x_bit_bool_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").withColumn(
        "m", F.col("event_id") % 4096
    )
    return (
        e.groupBy("event_type")
        .agg(
            F.expr("bit_and(m)").alias("ba"),
            F.expr("bit_or(m)").alias("bo"),
            F.expr("bit_xor(m)").alias("bx"),
            F.expr("bool_and(value > 0.5)").alias("all_hi"),
            F.expr("bool_or(value > 99.5)").alias("any_top"),
        )
        .orderBy("event_type")
    )


@register(
    "x_higher_order_arrays",
    oracle=(
        "SELECT doc_id, "
        "CAST(coalesce(list_sum(list_filter(list_transform("
        "string_split(text, ' '), w -> len(w)), x -> x > 3)), 0) "
        "AS BIGINT) AS long_chars, "
        "CAST(len(list_filter(list_transform(string_split(text, ' '), "
        "w -> len(w)), x -> x > 3)) AS INT) AS long_words, "
        "len(list_filter(list_transform(string_split(text, ' '), "
        "w -> len(w)), x -> x > 8)) > 0 AS has_giant "
        "FROM documents ORDER BY doc_id"
    ),
    doc=(
        "Higher-order array functions: transform → filter → "
        "aggregate (fold) and exists — Spark lambda expressions "
        "compiled into codegen, DuckDB list_transform/list_filter/"
        "list_sum. This is the collection-processing surface the "
        "JSON/proto middleware (T4–T6) feeds: repeated fields become "
        "arrays and never need Python. Pure projection, one scan, "
        "zero shuffles."
    ),
    tags=("functions", "array", "lambda"),
)
def x_higher_order_arrays(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    lens = F.transform(F.split("text", " "), lambda w: F.length(w))
    long_lens = F.filter(lens, lambda x: x > 3)
    return d.select(
        "doc_id",
        F.aggregate(
            long_lens, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("long_chars"),
        F.size(long_lens).cast("int").alias("long_words"),
        F.exists(lens, lambda x: x > 8).alias("has_giant"),
    ).orderBy("doc_id")


@register(
    "x_posexplode_ordinal",
    oracle=(
        "SELECT doc_id, pos, word FROM ("
        "SELECT doc_id, "
        "generate_subscripts(string_split(text, ' '), 1) AS pos, "
        "unnest(string_split(text, ' ')) AS word "
        "FROM documents) s "
        "ORDER BY doc_id, pos LIMIT 20000"
    ),
    doc=(
        "Generator with ordinality: posexplode (DuckDB unnest zipped "
        "with generate_subscripts) — the tokenizer exploded to one "
        "row per (doc, position), the input shape of the n-gram/"
        "doc-frequency family. Generate node directly over the scan; "
        "output cardinality is Σ words, but it streams through the "
        "pipeline (no materialization) into the bounded top-K sort. "
        "1-based positions on both engines."
    ),
    tags=("functions", "generator", "text"),
)
def x_posexplode_ordinal(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return (
        d.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("p", "word")
        )
        .select("doc_id", (F.col("p") + 1).alias("pos"), "word")
        .orderBy("doc_id", "pos")
        .limit(20000)
    )


@register(
    "x_decimal_arithmetic",
    oracle=(
        "SELECT l_returnflag, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) "
        "AS sum_price, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * "
        "CAST(l_discount AS DECIMAL(5,4))) AS VARCHAR) AS sum_disc_amt, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * "
        "(CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(5,4)))) "
        "AS VARCHAR) AS sum_net "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    doc=(
        "Fixed-point DECIMAL arithmetic: cast → multiply → subtract → "
        "sum with the ANSI precision/scale propagation rules "
        "(D(18,2)×D(5,4) → scale 6; both engines agree on result "
        "scale, so the VARCHAR rendering is identical) — exact money "
        "math with NO scaled-integer workaround, the capability the "
        "v100 trick elsewhere deliberately avoids needing. Decimal "
        "sums are associative — map-side partials, one small "
        "shuffle; Tungsten stores them as unscaled longs while "
        "precision ≤ 18."
    ),
    tags=("functions", "decimal", "agg"),
)
def x_decimal_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    ep = F.col("l_extendedprice").cast("decimal(18,2)")
    di = F.col("l_discount").cast("decimal(5,4)")
    one = F.lit(1).cast("decimal(5,4)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(ep).cast("string").alias("sum_price"),
            F.sum(ep * di).cast("string").alias("sum_disc_amt"),
            F.sum(ep * (one - di)).cast("string").alias("sum_net"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "x_codec_functions",
    oracle=(
        "SELECT event_id, "
        "md5(event_type) AS m5, "
        "sha256(event_type) AS s256, "
        "base64(encode(event_type)) AS b64, "
        "lower(to_hex(event_id % 4096)) AS hx, "
        "TRY_CAST(substr(event_type, 1, 2) AS INT) AS tc, "
        "CAST(round(value * 100) AS BIGINT) / nullif(event_id % 3, 0) "
        "AS td "
        "FROM events ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Codec + safe-eval pack: md5 / sha-256 (hex), base64, hex "
        "rendering, TRY_CAST (NULL on bad parse — the poison-message "
        "discipline R4 applied to scalars: never throw in the hot "
        "path, route nulls instead) and division made total via "
        "try_divide ≡ x / nullif(d, 0). All JVM codegen; hashing "
        "short strings is the cheap first pass of every content-"
        "hash dedup (x_content_hash_dedup runs it corpus-wide). "
        "The top-k runs FIRST over the slim source columns and the "
        "hashes are computed on the 5000 survivors — Catalyst won't "
        "reorder a projection past a sort on its own, and hashing "
        "the full corpus to keep 5000 rows is the kind of wasted "
        "work that matters at 100 TB."
    ),
    tags=("functions", "codec", "null"),
)
def x_codec_functions(spark: SparkSession, sf: str) -> DataFrame:
    top = (
        load_table(spark, sf, "events")
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
        .limit(5000)
    )
    t = F.col("event_type")
    return top.select(
        "event_id",
        F.md5(t).alias("m5"),
        F.sha2(t, 256).alias("s256"),
        F.base64(t.cast("binary")).alias("b64"),
        F.lower(F.hex(F.col("event_id") % 4096)).alias("hx"),
        F.expr("try_cast(substr(event_type, 1, 2) AS INT)").alias("tc"),
        F.try_divide(
            F.expr("CAST(round(value * 100) AS BIGINT)"),
            F.col("event_id") % 3,
        ).alias("td"),
    ).orderBy("event_id")


@register(
    "x_pattern_predicates",
    oracle=(
        "SELECT event_id, "
        "event_type LIKE 'c%' AS like_c, "
        "upper(event_type) ILIKE 'cL%' AS ilike_c, "
        "regexp_matches(event_type, '^(cl|si)') AS re_pre, "
        "event_type LIKE '%u^_%' ESCAPE '^' AS esc_underscore, "
        "split_part(props, ':', 2) AS second_field "
        "FROM events ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "Pattern-predicate pack: LIKE / case-insensitive ILIKE / "
        "regexp prefix match / LIKE with a custom ESCAPE character "
        "(matching a literal underscore) / split_part field "
        "extraction — the predicate surface route selectors are "
        "written in (ziggurat routes subscribe by topic REGEX, "
        "streams.clj:184; these are the same match primitives over "
        "payloads). All codegen'd predicates; a LIKE 'prefix%' on a "
        "scan column additionally compiles to a StartsWith pushed "
        "filter at the parquet reader — the 100 TB win is in the "
        "scan, not the expression."
    ),
    tags=("functions", "strings", "predicates"),
)
def x_pattern_predicates(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return (
        e.select(
            "event_id",
            F.col("event_type").like("c%").alias("like_c"),
            F.upper("event_type").ilike("cL%").alias("ilike_c"),
            F.col("event_type").rlike("^(cl|si)").alias("re_pre"),
            F.expr("event_type LIKE '%u^_%' ESCAPE '^'").alias(
                "esc_underscore"
            ),
            F.split_part("props", F.lit(":"), F.lit(2)).alias(
                "second_field"
            ),
        )
        .orderBy("event_id")
        .limit(5000)
    )


# Identical expression text on both engines: interleave the low 8
# bits of x and y into a 16-bit Morton (Z-order) code with shifts.
_MORTON = (
    "("
    + " + ".join(
        f"(((x >> {b}) & 1) << {2 * b}) + (((y >> {b}) & 1) << {2 * b + 1})"
        for b in range(8)
    )
    + ")"
)


@register(
    "x_morton_zorder",
    oracle=(
        "WITH s AS (SELECT event_id, "
        "CAST(round(value * 100) AS BIGINT) % 256 AS x, "
        "event_id % 256 AS y FROM events) "
        f"SELECT event_id, x, y, {_MORTON} AS morton "
        "FROM s ORDER BY morton, event_id LIMIT 5000"
    ),
    doc=(
        "Morton (Z-order) codes: interleave the bits of two columns "
        "into one locality-preserving sort key — the core of "
        "multi-dimensional data clustering (Delta OPTIMIZE ZORDER, "
        "Iceberg sort orders): sorting files by the Morton code "
        "lets min/max statistics prune scans on EITHER column. "
        "Pure BIGINT shift/mask algebra, identical expression text "
        "on both engines, exact. The ORDER BY morton is the actual "
        "layout operation — at 100 TB it becomes "
        "repartitionByRange(morton) + sortWithinPartitions before "
        "the write, one range shuffle."
    ),
    tags=("functions", "layout", "bitwise"),
)
def x_morton_zorder(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select(
        "event_id",
        (F.expr("CAST(round(value * 100) AS BIGINT)") % 256).alias("x"),
        (F.col("event_id") % 256).alias("y"),
    )
    return (
        e.select("event_id", "x", "y", F.expr(_MORTON).alias("morton"))
        .orderBy("morton", "event_id")
        .limit(5000)
    )


@register(
    "x_collated_grouping",
    oracle=(
        "WITH s AS (SELECT CASE WHEN event_id % 3 = 0 "
        "THEN upper(event_type) WHEN event_id % 3 = 1 "
        "THEN event_type ELSE "
        "upper(substr(event_type, 1, 1)) || substr(event_type, 2) "
        "END AS noisy, "
        "CAST(round(value * 100) AS BIGINT) AS v100 FROM events) "
        "SELECT lower(noisy) AS t, count(*) AS n, "
        "CAST(sum(v100) AS BIGINT) AS sv100, "
        "CAST(count(DISTINCT noisy) AS BIGINT) AS n_spellings "
        "FROM s GROUP BY lower(noisy) ORDER BY t"
    ),
    doc=(
        "Spark 4 collations: case-mixed route names (UPPER / lower / "
        "Capitalized spellings synthesized deterministically) group "
        "as ONE key under the UTF8_LCASE collation — the engine-"
        "level answer to case-insensitive matching that predicates "
        "and joins inherit without lower() rewrites (the collation "
        "rides the TYPE, so the optimizer still prunes and pushes "
        "down). Graded with the lower() spelling as the oracle, "
        "plus the per-group distinct-spelling census proving the "
        "input really was case-diverse. The group label is "
        "re-lowered for a deterministic representative."
    ),
    tags=("functions", "collation", "strings"),
)
def x_collated_grouping(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    # capitalized spelling built EXACTLY like the oracle (first char
    # uppered, rest verbatim) — initcap would diverge on multi-word
    # or interior-case values
    noisy = (
        F.when(F.col("event_id") % 3 == 0, F.upper("event_type"))
        .when(F.col("event_id") % 3 == 1, F.col("event_type"))
        .otherwise(
            F.concat(
                F.upper(F.substring("event_type", 1, 1)),
                F.expr("substr(event_type, 2)"),
            )
        )
    )
    s = e.select(
        noisy.alias("noisy"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
    )
    return (
        s.groupBy(F.expr("collate(noisy, 'UTF8_LCASE')").alias("ck"))
        .agg(
            F.count("*").alias("n"),
            F.sum("v100").alias("sv100"),
            F.countDistinct(F.expr("collate(noisy, 'UTF8_BINARY')"))
            .cast("bigint")
            .alias("n_spellings"),
        )
        .select(
            F.lower(F.col("ck").cast("string")).alias("t"),
            "n",
            "sv100",
            "n_spellings",
        )
        .orderBy("t")
    )


@register(
    "x_try_arithmetic",
    oracle=(
        "WITH s AS (SELECT event_id, "
        "CAST(round(value * 100) AS BIGINT) AS v100, "
        "CASE WHEN event_id % 211 = 0 "
        "THEN 9223372036854775807 ELSE event_id END AS big "
        "FROM events) "
        "SELECT event_id, "
        "CASE WHEN big > 9223372036854775807 - v100 THEN NULL "
        "ELSE big + v100 END AS safe_add, "
        "CASE WHEN big > 9223372036854775807 / greatest(v100, 1) "
        "THEN NULL ELSE big * v100 END AS safe_mul, "
        "v100 / nullif(event_id % 7, 0) AS safe_div "
        "FROM s ORDER BY event_id LIMIT 5000"
    ),
    doc=(
        "ANSI-safe arithmetic: try_add / try_multiply / try_divide "
        "return NULL where plain operators would THROW under ANSI "
        "mode (on by default in Spark 4 — an engineered int64 "
        "overflow every 211th row would otherwise kill the whole "
        "job). This is the poison-message discipline (R4) applied "
        "to arithmetic: never throw in the hot path, route NULLs. "
        "The oracle spells the same totality with explicit overflow "
        "guards. Codegen'd per-row expressions; one scan + the "
        "top-k sort."
    ),
    tags=("functions", "ansi", "null"),
)
def x_try_arithmetic(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    s = e.select(
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v100"),
        F.when(
            F.col("event_id") % 211 == 0,
            F.lit(9223372036854775807).cast("bigint"),
        )
        .otherwise(F.col("event_id"))
        .alias("big"),
    )
    return (
        s.select(
            "event_id",
            F.expr("try_add(big, v100)").alias("safe_add"),
            F.expr("try_multiply(big, v100)").alias("safe_mul"),
            F.expr("try_divide(v100, nullif(event_id % 7, 0))").alias(
                "safe_div"
            ),
        )
        .orderBy("event_id")
        .limit(5000)
    )

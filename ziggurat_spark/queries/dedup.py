"""Near-duplicate detection over ``documents`` — the dedup family a
training-data pipeline needs (exact dedup is z25 in setops.py).

- MinHash signatures + LSH banding → candidate pairs
- SimHash per document
- word-5-gram Jaccard similarity pairs (exact set overlap)

All engine-parity hashing comes from functions/texthash.py; the
whole family is higher-order array expressions + one equi-join, no
Python.

Scale shape (100 TB corpus): signatures are ONE parallel pass — the
signature array is built once per document and band rows are
`explode`d from it (never re-derived per band or per join side;
Spark's higher-order functions are interpreted, so accidental
re-evaluation of the hash chain is the difference between one corpus
pass and ten). LSH candidate generation is a self-equi-join on
(band, bucket) — a shuffle keyed by bucket with fan-out bounded by
bucket size, NOT an O(n²) comparison. Exact Jaccard uses an
inverted-index join over 5-gram shingles (longer shingles keep the
posting lists short — the standard near-dup configuration). This is
the MinHashLSH construction from Broder '97 / MMDS ch.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.functions import texthash as TH
from ziggurat_spark.queries.registry import register
from ziggurat_spark.queries.similarity import _cosine
from ziggurat_spark.tables import load_table

N_HASHES = 8
BANDS = 4  # → 2 rows per band
ROWS_PER_BAND = N_HASHES // BANDS
MINHASH_SHINGLE_K = 3
JACCARD_SHINGLE_K = 5

#: Spark literal array<struct<a,b>> of the minhash permutations.
_PERMS_SQL = (
    "array("
    + ", ".join(
        f"named_struct('a', CAST({a} AS BIGINT), 'b', CAST({b} AS BIGINT))"
        for a, b in TH.MINHASH_PERMS
    )
    + ")"
)

#: Full signature as ONE array expression: the shingle column is
#: referenced once, so the tokenize→hash chain is evaluated once per
#: row no matter how many permutations.
_MHS_SQL = (
    f"transform({_PERMS_SQL}, "
    f"p -> array_min(transform(sh, s -> (s * p.a + p.b) % {TH.P})))"
)


def _with_shingles(spark: SparkSession, sf: str, k: int) -> DataFrame:
    d = load_table(spark, sf, "documents")
    return (
        d.withColumn("words", F.expr(TH.tokens("text")[0]))
        .withColumn("whash", F.expr(TH.word_hashes("words")[0]))
        .withColumn("sh", F.expr(TH.shingle_hashes("whash", k)[0]))
    )


def _duck_shingle_cte(k: int) -> str:
    return (
        "WITH tok AS (SELECT doc_id, "
        f"{TH.tokens('text')[1]} AS words FROM documents), "
        f"wh AS (SELECT doc_id, {TH.word_hashes('words')[1]} AS whash FROM tok), "
        f"sh AS (SELECT doc_id, {TH.shingle_hashes('whash', k)[1]} AS sh FROM wh)"
    )


@register(
    "x_minhash_signature",
    oracle=(
        _duck_shingle_cte(MINHASH_SHINGLE_K)
        + " SELECT doc_id, "
        + ", ".join(
            f"{TH.minhash('sh', j)[1]} AS mh{j}" for j in range(N_HASHES)
        )
        + " FROM sh ORDER BY doc_id"
    ),
    doc=(
        "8-permutation MinHash signature per document over word "
        "3-shingles. NULL signature = doc shorter than 3 words."
    ),
    tags=("dedup", "minhash"),
)
def x_minhash_signature(spark: SparkSession, sf: str) -> DataFrame:
    d = _with_shingles(spark, sf, MINHASH_SHINGLE_K).withColumn(
        "mhs", F.expr(_MHS_SQL)
    )
    cols = [F.element_at("mhs", j + 1).alias(f"mh{j}") for j in range(N_HASHES)]
    return d.select("doc_id", *cols).orderBy("doc_id")


def _duck_band_key(b: int) -> str:
    j0, j1 = b * ROWS_PER_BAND, b * ROWS_PER_BAND + 1
    m0 = TH.minhash("sh", j0)[1]
    m1 = TH.minhash("sh", j1)[1]
    return f"(({m0}) * {TH.C1} + ({m1})) % {TH.P}"


@register(
    "x_minhash_lsh_pairs",
    oracle=(
        _duck_shingle_cte(MINHASH_SHINGLE_K)
        + ", bands AS ("
        + " UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, ({_duck_band_key(b)}) AS bucket FROM sh"
            for b in range(BANDS)
        )
        + ") SELECT DISTINCT a.doc_id AS a, b.doc_id AS b "
        "FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket "
        "AND a.doc_id < b.doc_id WHERE a.bucket IS NOT NULL "
        "ORDER BY a, b"
    ),
    doc=(
        "LSH candidate pairs: docs sharing any (band, bucket). Bands "
        "are exploded from one signature array (single corpus pass), "
        "then self-equi-joined on the bucket key — the scalable "
        "O(candidates) path, never all-pairs."
    ),
    tags=("dedup", "minhash", "lsh"),
)
def x_minhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    d = _with_shingles(spark, sf, MINHASH_SHINGLE_K).withColumn(
        "mhs", F.expr(_MHS_SQL)
    )
    band_structs = ", ".join(
        f"named_struct('band', {b}, 'bucket', "
        f"(element_at(mhs, {b * ROWS_PER_BAND + 1}) * {TH.C1} "
        f"+ element_at(mhs, {b * ROWS_PER_BAND + 2})) % {TH.P})"
        for b in range(BANDS)
    )
    bands = d.select(
        "doc_id", F.explode(F.expr(f"array({band_structs})")).alias("bb")
    ).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    ).filter(F.col("bucket").isNotNull())
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
        .orderBy("a", "b")
    )


@register(
    "x_simhash",
    oracle=(
        "WITH tok AS (SELECT doc_id, "
        f"{TH.tokens('text')[1]} AS words FROM documents), "
        f"wh AS (SELECT doc_id, {TH.word_hashes('words')[1]} AS whash FROM tok) "
        f"SELECT doc_id, {TH.simhash32('whash')[1]} AS simhash "
        "FROM wh ORDER BY doc_id"
    ),
    doc=(
        "32-bit SimHash per document (Charikar '02): majority vote per "
        "bit over token hashes. Near-dups have small Hamming distance."
    ),
    tags=("dedup", "simhash"),
)
def x_simhash(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents")
    d = d.withColumn("words", F.expr(TH.tokens("text")[0])).withColumn(
        "whash", F.expr(TH.word_hashes("words")[0])
    )
    return d.select(
        "doc_id", F.expr(TH.simhash32("whash")[0]).alias("simhash")
    ).orderBy("doc_id")


JACCARD_THRESHOLD = 0.35


@register(
    "x_ngram_jaccard_pairs",
    oracle=(
        _duck_shingle_cte(JACCARD_SHINGLE_K)
        + ", ex AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM sh), "
        "sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i "
        "  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id "
        "  GROUP BY a.doc_id, b.doc_id) "
        "SELECT inter.a, inter.b, "
        "CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard "
        "FROM inter JOIN sizes sa ON sa.doc_id = inter.a "
        "JOIN sizes sb ON sb.doc_id = inter.b "
        f"WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD} "
        "ORDER BY a, b"
    ),
    doc=(
        "Exact word-5-gram Jaccard pairs above a threshold. "
        "Inverted-index style: explode distinct shingles, self-join on "
        "shingle (shuffle keyed by shingle), count intersections, "
        "ratio against exact set sizes. 5-gram shingles keep posting "
        "lists short (bounded join fan-out) — the standard exact "
        "verify stage of a near-dup pipeline."
    ),
    tags=("dedup", "jaccard"),
)
def x_ngram_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    d = _with_shingles(spark, sf, JACCARD_SHINGLE_K)
    ex = d.select("doc_id", F.explode("sh").alias("s")).distinct()
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("i").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("i"))
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("a"))
        .join(sb, F.col("sb.doc_id") == F.col("b"))
        .select("a", "b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .orderBy("a", "b")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicates: SRP-LSH buckets + exact verify
# ---------------------------------------------------------------------------

EMB_DIM = 64
SRP_P = 2_147_483_647  # 2^31 - 1; i * A_j stays far below 2^63
SRP_BITS = 16
SRP_BANDS = 4
BITS_PER_BAND = SRP_BITS // SRP_BANDS
#: Deterministic per-hyperplane multipliers (replicable in the oracle).
SRP_A = [(j * 2_654_435_761 + 40_503) % SRP_P for j in range(1, SRP_BITS + 1)]
COSINE_NEARDUP_THRESHOLD = 0.4


def _srp_bit(col: str, j: int, engine: int) -> str:
    """Sign bit of dot(embedding, hyperplane_j) where hyperplane_j is
    the deterministic ±1 vector h[i] = sign((i * A_j) mod P - P/2).
    Strict left fold in index order → bit-identical doubles on both
    engines (same parity story as similarity._dot)."""
    a = SRP_A[j]
    sign = (
        f"(CASE WHEN (CAST(i AS BIGINT) * {a}) % {SRP_P} < {SRP_P // 2} "
        f"THEN -1.0 ELSE 1.0 END)"
    )
    if engine == 0:
        return (
            f"(aggregate(sequence(1, {EMB_DIM}), CAST(0 AS DOUBLE), "
            f"(acc, i) -> acc + CAST(element_at({col}, i) AS DOUBLE) * {sign}) "
            f">= CAST(0 AS DOUBLE))"
        )
    return (
        f"(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {EMB_DIM} + 1), "
        f"i -> CAST({col}[i] AS DOUBLE) * {sign})), "
        f"(acc, v) -> acc + v) >= CAST(0 AS DOUBLE))"
    )


def _srp_bucket(col: str, band: int, engine: int) -> str:
    """4 sign bits of one band packed into an INT bucket key."""
    terms = [
        f"(CASE WHEN {_srp_bit(col, band * BITS_PER_BAND + t, engine)} "
        f"THEN {1 << (BITS_PER_BAND - 1 - t)} ELSE 0 END)"
        for t in range(BITS_PER_BAND)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "x_embedding_neardup",
    oracle=(
        "WITH bands AS ("
        + " UNION ALL ".join(
            f"SELECT vec_id, {b} AS band, "
            f"{_srp_bucket('embedding', b, 1)} AS bucket FROM embeddings"
            for b in range(SRP_BANDS)
        )
        + "), cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b "
        "FROM bands x JOIN bands y ON x.band = y.band "
        "AND x.bucket = y.bucket AND x.vec_id < y.vec_id) "
        "SELECT cand.a, cand.b, "
        f"{_cosine('ea.embedding', 'eb.embedding', 1)} AS score "
        "FROM cand JOIN embeddings ea ON ea.vec_id = cand.a "
        "JOIN embeddings eb ON eb.vec_id = cand.b "
        f"WHERE {_cosine('ea.embedding', 'eb.embedding', 1)} "
        f">= {COSINE_NEARDUP_THRESHOLD} ORDER BY a, b"
    ),
    doc=(
        "Embedding near-dup pairs: random-hyperplane (SRP) LSH — 16 "
        "deterministic sign bits, 4 bands of 4 — bucket join for "
        "candidates, then exact cosine >= threshold (Charikar '02). "
        "One pass to compute bits, a bucket-keyed shuffle for "
        "candidates (never all-pairs), exact verify only on "
        "candidates. Recall < 1 by construction; the oracle replicates "
        "the identical banding so results hash-match."
    ),
    tags=("dedup", "similarity", "lsh"),
)
def x_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    band_structs = ", ".join(
        f"named_struct('band', {b}, 'bucket', {_srp_bucket('embedding', b, 0)})"
        for b in range(SRP_BANDS)
    )
    bands = e.select(
        "vec_id", F.explode(F.expr(f"array({band_structs})")).alias("bb")
    ).select("vec_id", "bb.band", "bb.bucket")
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("e_a"))
    eb = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("e_b"))
    return (
        cand.join(ea, "a")
        .join(eb, "b")
        .withColumn("score", F.expr(_cosine("e_a", "e_b", 0)))
        .filter(F.col("score") >= COSINE_NEARDUP_THRESHOLD)
        .select("a", "b", "score")
        .orderBy("a", "b")
    )

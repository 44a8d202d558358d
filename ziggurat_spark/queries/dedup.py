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

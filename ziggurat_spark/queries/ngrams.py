"""Word n-gram mining over the documents corpus — corpus-level
bigram frequencies, the classic language-model/text-pipeline
primitive (the unigram form is x_word_count; the per-doc shingle
form feeds the MinHash family in queries/dedup.py).

Bigrams are built INSIDE the array domain with a higher-order
transform over an index sequence (no self-join of exploded tokens —
which would shuffle the full token stream twice and equi-join on
(doc_id, pos)); the single explode then feeds an ordinary
count-group-by. One scan, one Generate, one agg shuffle, bounded
top-K sort — the same plan at 100 TB with the agg's map-side
partials doing the heavy lifting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


@register(
    "x_top_bigrams",
    oracle=(
        "WITH w AS (SELECT string_split(text, ' ') AS words FROM documents), "
        "b AS (SELECT unnest(list_transform(range(1, len(words)), "
        "i -> words[i] || ' ' || words[i + 1])) AS bigram FROM w) "
        "SELECT bigram, count(*) AS n FROM b "
        "GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50"
    ),
    doc=(
        "Corpus top-50 bigrams: tokenize → adjacent-pair transform "
        "(array-domain, 0-based Spark indexing vs 1-based DuckDB "
        "list indexing — same pairs) → explode → count → "
        "deterministic (n DESC, bigram) top-K. The explode streams "
        "through the partial aggregate without materializing the "
        "token stream; the shuffle carries only distinct bigram "
        "partials."
    ),
    tags=("text", "ngram"),
)
def x_top_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    d = load_table(spark, sf, "documents", fan_out=True)
    # tokenize ONCE into a projected column: lambda bodies get no
    # loop-invariant hoisting, so split(text) written inline in the
    # transform would re-split the document per element — O(L²)
    # per doc. words[i] is 0-based in Spark lambdas, so
    # sequence(1, size-1) pairs words[i-1] with words[i].
    tok = d.select(F.split("text", " ").alias("words"))
    # sequence(1, 0) is DESCENDING ([1, 0]): a 1-token doc would
    # index words[-1] — INVALID_ARRAY_INDEX under ANSI. Empty array
    # matches the oracle (no bigram rows for 1-token docs).
    bigrams = F.expr(
        "if(size(words) < 2, array(), "
        "transform(sequence(1, size(words) - 1), "
        "i -> concat(words[i-1], ' ', words[i])))"
    )
    return (
        tok.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )


#: BM25 query terms (mixed document frequencies in the synthetic
#: vocabulary → a spread of idf weights) and Robertson parameters
#: k1 = 1.2 = 6/5, b = 0.75 = 3/4, carried as exact rationals.
BM25_TERMS = ("join", "merge", "spark")
BM25_TOPK = 10


def _bm25_oracle() -> str:
    from ziggurat_spark.functions import texthash as TH

    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return (
        "WITH tok AS (SELECT doc_id, "
        f"{TH.tokens('text')[1]} AS words FROM documents), "
        "stats AS (SELECT count(*) AS n_docs, "
        "CAST(sum(len(words)) AS BIGINT) AS n_tokens FROM tok), "
        "tf AS (SELECT doc_id, len(words) AS dl, t.term, "
        "len(list_filter(words, w -> w = t.term)) AS tf "
        f"FROM tok, (SELECT unnest([{terms}]) AS term) t), "
        "tf1 AS (SELECT * FROM tf WHERE tf > 0), "
        "df AS (SELECT term, CAST(((SELECT n_docs FROM stats) - count(*)"
        " + 1) * 1000000 // (count(*) + 1) AS BIGINT) AS idf_ppm "
        "FROM tf1 GROUP BY term), "
        "sc AS (SELECT tf1.doc_id, "
        "idf_ppm * (44 * n_tokens * tf) // "
        "(20 * n_tokens * tf + 6 * n_tokens + 18 * dl * n_docs) AS s "
        "FROM tf1 JOIN df USING (term) CROSS JOIN stats) "
        "SELECT doc_id, CAST(sum(s) AS BIGINT) AS score "
        "FROM sc GROUP BY doc_id "
        f"ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}"
    )


@register(
    "x_bm25_topk",
    oracle=_bm25_oracle(),
    doc=(
        "BM25 retrieval ranking (Robertson/Sparck-Jones) over the "
        "corpus for a fixed query — the scoring function behind "
        "lexical corpus search and RAG retrieval baselines. Carried "
        "in EXACT integer math so the oracle hash-matches: k1=6/5 "
        "and b=3/4 as rationals, both sides of the per-term fraction "
        "multiplied by 20·T (T = corpus token count), and a rational "
        "idf_ppm = (N-df+1)·10⁶ // (df+1) in place of the log (order-"
        "preserving for ranking; the float-log spelling differs only "
        "in last-ulp libm behavior between engines). Shape: one "
        "tokenize pass, per-doc term counts from the projected words "
        "array, a 3-row df aggregate joined back broadcast-size, one "
        "final top-k — no shuffle wider than (docs × query terms)."
    ),
    tags=("text", "retrieval", "ngram"),
)
def x_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    from ziggurat_spark.functions import texthash as TH

    toks = load_table(spark, sf, "documents", fan_out=True).select(
        "doc_id", F.expr(TH.tokens("text")[0]).alias("words")
    )
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("words")).cast("bigint").alias("n_tokens"),
    )
    term_col = F.explode(
        F.array(*[F.lit(t) for t in BM25_TERMS])
    ).alias("term")
    tf = toks.select(
        "doc_id", F.size("words").alias("dl"), term_col, "words"
    ).select(
        "doc_id",
        "dl",
        "term",
        F.expr("size(filter(words, w -> w = term))").alias("tf"),
    )
    tf1 = tf.filter(F.col("tf") > 0)
    df_t = tf1.groupBy("term").agg(F.count("*").alias("df"))
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "term",
        F.expr(
            "CAST((n_docs - df + 1) * 1000000 div (df + 1) AS BIGINT)"
        ).alias("idf_ppm"),
    )
    sc = (
        tf1.join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                "idf_ppm * (44 * n_tokens * tf) div "
                "(20 * n_tokens * tf + 6 * n_tokens + 18 * dl * n_docs)"
            ).alias("s"),
        )
    )
    return (
        sc.groupBy("doc_id")
        .agg(F.sum("s").cast("bigint").alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(BM25_TOPK)
    )


COOC_TOP_K = 20


@register(
    "x_cooccurrence_topk",
    oracle=(
        "WITH tk AS (SELECT string_split_regex(trim(text), '\\s+') AS tk "
        "FROM documents), "
        "p AS (SELECT CASE WHEN a < b THEN a || ' ' || b "
        "ELSE b || ' ' || a END AS pair FROM ("
        "SELECT unnest(CASE WHEN len(tk) < 2 THEN []::VARCHAR[] ELSE "
        "list_transform(range(2, len(tk) + 1), i -> tk[i-1]) END) AS a, "
        "unnest(CASE WHEN len(tk) < 2 THEN []::VARCHAR[] ELSE "
        "list_transform(range(2, len(tk) + 1), i -> tk[i]) END) AS b "
        "FROM tk "
        "UNION ALL "
        "SELECT unnest(CASE WHEN len(tk) < 3 THEN []::VARCHAR[] ELSE "
        "list_transform(range(3, len(tk) + 1), i -> tk[i-2]) END) AS a, "
        "unnest(CASE WHEN len(tk) < 3 THEN []::VARCHAR[] ELSE "
        "list_transform(range(3, len(tk) + 1), i -> tk[i]) END) AS b "
        "FROM tk)), "
        "c AS (SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM p "
        "GROUP BY pair) "
        f"SELECT pair, cnt, CAST(rnk AS BIGINT) AS rnk FROM ("
        f"SELECT *, row_number() OVER (ORDER BY cnt DESC, pair) AS rnk "
        f"FROM c) WHERE rnk <= {COOC_TOP_K} ORDER BY rnk"
    ),
    doc=(
        "Word co-occurrence counts in a ±2-token window (the "
        "word2vec/GloVe statistics pass): unordered pairs normalized "
        "by least/greatest, distance-1 and distance-2 neighbors, "
        "top-20 by count. Scale shape: pairs are generated JVM-side "
        "from each document's token array (≤ 2 pairs per token — "
        "linear blowup, bounded), one pair groupBy shuffle whose "
        "width is vocab²-bounded, and only the count table reaches "
        "the top-k window."
    ),
    tags=("text", "ngrams", "corpus"),
)
def x_cooccurrence_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    tk_df = load_table(spark, sf, "documents", fan_out=True).select(
        F.split(F.trim(F.col("text")), r"\s+").alias("tk")
    )
    pairs_expr = (
        "concat("
        "if(size(tk) < 2, array(), transform(sequence(1, size(tk) - 1),"
        " i -> struct(tk[i-1] AS a, tk[i] AS b))), "
        "if(size(tk) < 3, array(), transform(sequence(1, size(tk) - 2),"
        " i -> struct(tk[i-1] AS a, tk[i+1] AS b))))"
    )
    pair = F.concat_ws(
        " ",
        F.least(F.col("p.a"), F.col("p.b")),
        F.greatest(F.col("p.a"), F.col("p.b")),
    )
    c = (
        tk_df.select(F.explode(F.expr(pairs_expr)).alias("p"))
        .select(pair.alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    w = W.orderBy(F.desc("cnt"), F.asc("pair"))
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= COOC_TOP_K)
        .select("pair", "cnt", F.col("rnk").cast("bigint").alias("rnk"))
        .orderBy("rnk")
    )

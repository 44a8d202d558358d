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

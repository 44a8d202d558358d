"""Regression pins for degenerate document shapes.

ADVICE round 2: the bigram fan-out `sequence(1, size(ws)-1)` is
DESCENDING ([1, 0]) when a doc has a single token, so `ws[i-1]`
indexes ws[-1] — INVALID_ARRAY_INDEX under the session's ANSI mode
(and phantom NULL-bigram rows with ANSI off, which the DuckDB oracle
omits). The fix guards the fan-out with `if(size(ws) < 2, array(),
...)` at text.py (x_repetition_filter), corpus_ops.py
(x_corpus_pipeline_v2) and ngrams.py (x_top_bigrams). These tests
run those queries over a corpus that actually CONTAINS 1-token and
empty docs — the shipped test data does not.
"""

from __future__ import annotations

import pytest

DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "solo", "en", "web", 4),
    (2, "", "en", "web", 0),
    (3, "two tokens", "en", "web", 10),
    (4, "a a a a a a", "en", "books", 11),
    (5, "   ", "en", "web", 3),  # whitespace-only → trim → [""]
]


@pytest.fixture(scope="module")
def edge_sf(spark, tmp_path_factory):
    import pandas as pd

    # load_table expects {sf}/documents.parquet to be a single FILE
    # (it reads the footer with pyarrow for the nanos check), so
    # write it with pandas, not Spark's directory layout.
    d = tmp_path_factory.mktemp("edge_docs")
    pd.DataFrame(
        DOCS, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(d / "documents.parquet"))
    return str(d)


def test_repetition_filter_single_token_docs(spark, edge_sf):
    from ziggurat_spark.queries.registry import all_queries

    rows = all_queries()["x_repetition_filter"].spark(spark, edge_sf).collect()
    # Must not raise INVALID_ARRAY_INDEX; 1-token docs contribute no
    # bigrams but still get word stats.
    ids = {r["doc_id"] for r in rows}
    assert 1 in ids or len(rows) >= 0  # executed without ANSI crash


def test_top_bigrams_single_token_docs(spark, edge_sf):
    from ziggurat_spark.queries.registry import all_queries

    rows = all_queries()["x_top_bigrams"].spark(spark, edge_sf).collect()
    bigrams = {r["bigram"] for r in rows}
    # doc 3 has exactly one bigram; docs 1/2/5 contribute none.
    assert "two tokens" in bigrams
    assert all(b is not None for b in bigrams)


def test_corpus_pipeline_v2_single_token_docs(spark, edge_sf):
    from ziggurat_spark.queries.registry import all_queries

    # Flagship composite uses the same bigram fan-out internally —
    # must execute end-to-end over the degenerate corpus.
    all_queries()["x_corpus_pipeline_v2"].spark(spark, edge_sf).collect()


def test_bpe_apply_respects_symbol_boundaries(spark, tmp_path):
    """ADVICE round 3: a raw replace(sp, 'h e', 'he') also matched
    where 'h' is the SUFFIX of the multi-char symbol 'th' ('th e' →
    'the'), merging fragments never counted as that pair. Corpus
    engineered so round 1 merges 't h' (count 8 > 5) and round 2
    merges 'h e' (count 3 > 2): the word 'the' is then 'th e' and
    must NOT be touched by the 'h e' merge.

    Symbol counts: r0 = 6·2+2·3+3·2 = 24; r1 ('t h'): 6·1+2·2+3·2 =
    16; r2 ('h e', boundary-safe): 6·1+2·2+3·1 = 13. The buggy apply
    gave 11 (the two 'th e' words collapsed to 'the')."""
    import pandas as pd

    from ziggurat_spark.queries.corpus_ops import x_bpe_tokenize

    text = " ".join(["th"] * 6 + ["the"] * 2 + ["he"] * 3)
    pd.DataFrame(
        {
            "doc_id": [1],
            "text": [text],
            "lang": ["en"],
            "source": ["s1"],
            "n_chars": [len(text)],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    rows = x_bpe_tokenize(spark, str(tmp_path)).collect()
    assert [(r.merge_round, r.total_symbols, r.saved_ppm) for r in rows] == [
        (0, 24, 0),
        (1, 16, 333333),
        (2, 13, 458333),
    ]


def test_bpe_apply_merges_runs_left_to_right(spark, tmp_path):
    """Classical BPE apply on a run: 'a a a a' merges to 'aa aa'
    (non-overlapping, left-to-right) — the boundary-safe rewrite must
    not under-merge runs by consuming the shared separator."""
    import pandas as pd

    from ziggurat_spark.queries.corpus_ops import x_bpe_tokenize

    pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["aaaa aaaa aaa"],
            "lang": ["en"],
            "source": ["s1"],
            "n_chars": [13],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    rows = x_bpe_tokenize(spark, str(tmp_path)).collect()
    # r0: 4+4+3 = 11 symbols. r1 merges 'a a' → 'aa aa' (2), 'aa aa'
    # (2), 'aa a' (2) = 6. r2 merges 'aa aa' → 1+1 and 'aa a' stays =
    # 1+1+2 = 4.
    assert [(r.merge_round, r.total_symbols) for r in rows] == [
        (0, 11),
        (1, 6),
        (2, 4),
    ]


def test_bpe_merge_less_corpus_keeps_symbols(spark, tmp_path):
    """A corpus of single-character words has no adjacent pair: both
    merge rounds must be no-ops (same symbol count, 0 ppm saved),
    not empty the corpus through the winner join."""
    import pandas as pd

    from ziggurat_spark.queries.corpus_ops import x_bpe_tokenize

    pd.DataFrame(
        {
            "doc_id": [1],
            "text": ["a b c"],
            "lang": ["en"],
            "source": ["s1"],
            "n_chars": [5],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    rows = x_bpe_tokenize(spark, str(tmp_path)).collect()
    assert [(r.merge_round, r.total_symbols, r.saved_ppm) for r in rows] == [
        (0, 3, 0),
        (1, 3, 0),
        (2, 3, 0),
    ]


def test_round4_training_ops_degenerate_docs(spark, edge_sf):
    """Round-4 ops must execute over 1-token / empty / whitespace-only
    docs without ANSI crashes (sequence() descending, div-by-zero):
    the shipped test data contains none of these shapes."""
    from ziggurat_spark.queries.registry import all_queries

    specs = all_queries()
    for name in (
        "x_dsir_importance",
        "x_token_budget_sample",
        "x_quality_classifier",
        "x_ngram_novelty",
        "x_corpus_pipeline_v4",
    ):
        rows = specs[name].spark(spark, edge_sf).collect()
        assert rows is not None  # executed end-to-end

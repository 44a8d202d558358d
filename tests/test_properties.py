"""Property tests (SURVEY §5.2): the backoff algebra checked
exhaustively over its whole discrete domain, and the vectorized
hash primitives checked against naive per-element Python
implementations on hypothesis-generated text."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ziggurat_spark.functions import texthash as TH
from ziggurat_spark.functions.backoff import (
    MAX_EXPONENTIAL_RETRIES,
    backoff_ms_expr,
)


def reference_backoff_ms(
    message_retry_count: int, retry_count: int, timeout_ms: int
) -> float:
    """producer.clj:204 restated: ((2^n)-1) * timeout, with
    n = max(1, min(25, retry-count) - message-retry-count)."""
    n = max(1, min(MAX_EXPONENTIAL_RETRIES, retry_count) - message_retry_count)
    return float((2**n - 1) * timeout_ms)


def test_exponential_backoff_exhaustive_grid(spark):
    """Every (retry_count 1..30, consumed 0..30, timeout) cell — the
    full domain, stronger than sampling. Covers the n>=1 floor and
    the MAX_EXPONENTIAL_RETRIES=25 cap."""
    cases = [
        (rc, mrc, t)
        for rc in range(1, 31)
        for mrc in range(0, 31)
        for t in (100, 5000)
    ]
    df = spark.createDataFrame(cases, "rc int, mrc int, t int")
    # the module API takes scalar retry_count/timeout; for the grid,
    # spell the same expression with per-row columns
    n = F.greatest(
        F.lit(1),
        F.least(F.lit(MAX_EXPONENTIAL_RETRIES), F.col("rc")) - F.col("mrc"),
    )
    expr = (F.pow(F.lit(2), n) - F.lit(1)) * F.col("t")
    rows = df.withColumn("b", expr).collect()
    for r in rows:
        assert r.b == reference_backoff_ms(r.mrc, r.rc, r.t), (r.rc, r.mrc, r.t)
    # and the module's fixed-config Column agrees on the default cell
    fixed = spark.createDataFrame(
        [(m,) for m in range(0, 8)], "mrc int"
    ).select(
        "mrc",
        backoff_ms_expr(
            F.col("mrc"), retry_count=5, timeout_ms=5000, exponential=True
        ).alias("b"),
    )
    for r in fixed.collect():
        assert r.b == reference_backoff_ms(r.mrc, 5, 5000)


def naive_word_hashes(text: str) -> list[int]:
    out = []
    for w in text.lower().split(" "):
        if not w:
            continue
        h = TH.SEED
        for c in w:
            h = (h * TH.BASE + ord(c)) % TH.P
        out.append(h)
    return out


def naive_fingerprint(text: str) -> int:
    h = TH.SEED
    for c in text:
        h = (h * TH.BASE + ord(c)) % TH.P
    return h


text_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA0),
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(text_st, max_size=8))
def test_np_word_hashes_matches_naive(texts):
    got = TH.np_word_hashes(texts)
    for t, g in zip(texts, got):
        assert list(g) == naive_word_hashes(t)


@settings(max_examples=200, deadline=None)
@given(st.lists(text_st, max_size=8))
def test_np_fingerprint_matches_naive(texts):
    got = TH.np_char_fingerprints(texts)
    for t, g in zip(texts, got):
        assert g == naive_fingerprint(t)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=TH.P - 1), max_size=30),
    st.integers(min_value=2, max_value=6),
)
def test_np_shingles_and_minhash_invariants(whash, k):
    wh = np.array(whash, dtype=np.int64)
    sh = TH.np_shingle_hashes(wh, k)
    if len(wh) < k:
        assert sh.size == 0
        assert TH.np_minhash_signature(sh) is None
    else:
        assert sh.size == len(wh) - k + 1
        assert ((0 <= sh) & (sh < TH.P)).all()
        sig = TH.np_minhash_signature(sh)
        assert sig.shape == (len(TH.MINHASH_PERMS),)
        # each minhash is the min over the permuted shingles
        for j, (a, b) in enumerate(TH.MINHASH_PERMS):
            assert sig[j] == min((int(s) * a + b) % TH.P for s in sh)

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


def test_asof_nearest_matches_pandas_merge_asof(spark):
    """asof_join_nearest vs pandas.merge_asof(direction='nearest') on
    a seeded random dataset: identical matches everywhere (pandas
    breaks distance ties backward, same as our operator)."""
    import pandas as pd

    from ziggurat_spark.operators.asof import asof_join_nearest

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 300),
            "lts": rng.integers(0, 10_000, 300).astype("datetime64[s]"),
            "lid": np.arange(300),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 120),
            "rts": rng.integers(0, 10_000, 120).astype("datetime64[s]"),
        }
    )
    # dedupe per (k, ts) for determinism (operator contract) and give
    # each right row a payload id
    right = right.drop_duplicates(["k", "rts"]).reset_index(drop=True)
    right["rid"] = np.arange(len(right))

    out = asof_join_nearest(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on=["k"],
        left_ts="lts",
        right_ts="rts",
    ).toPandas()

    exp = pd.merge_asof(
        left.sort_values("lts", kind="stable"),
        right.sort_values("rts", kind="stable"),
        left_on="lts",
        right_on="rts",
        by="k",
        direction="nearest",
    )
    got = out.set_index("lid")["rid"].sort_index()
    want = exp.set_index("lid")["rid"].sort_index()
    eq = (got.isna() & want.isna()) | (got == want)
    assert eq.all(), pd.DataFrame({"got": got[~eq], "want": want[~eq]})


@given(
    st.recursive(
        st.dictionaries(
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(0, 9),
            max_size=3,
        ),
        lambda inner: st.dictionaries(
            st.sampled_from(["a", "b", "c", "d"]), inner, max_size=3
        ),
        max_leaves=8,
    ),
    st.recursive(
        st.dictionaries(
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(10, 19),
            max_size=3,
        ),
        lambda inner: st.dictionaries(
            st.sampled_from(["a", "b", "c", "d"]), inner, max_size=3
        ),
        max_leaves=8,
    ),
)
@settings(max_examples=200, deadline=None)
def test_deep_merge_right_biased_and_total(a, b):
    """config.clj:62-69 algebra: every path in the merge resolves to
    b's value when b has it (non-map collision), else a's; merged
    key set is the union at every level."""
    from ziggurat_spark.config import deep_merge

    out = deep_merge(a, b)

    def check(x, y, m):
        assert set(m) == set(x) | set(y)
        for k in m:
            if k in x and k in y and isinstance(x[k], dict) and isinstance(y[k], dict):
                check(x[k], y[k], m[k])
            elif k in y:
                assert m[k] == y[k]
            else:
                assert m[k] == x[k]

    check(a, b, out)

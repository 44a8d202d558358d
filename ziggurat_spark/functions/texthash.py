"""Deterministic text-hash primitives with engine parity.

MinHash/SimHash/fingerprinting need a hash function that Spark and
the DuckDB oracle compute IDENTICALLY. Built-in hashes differ across
engines (xxhash64 vs duckdb hash), so we define one in portable
integer SQL: a polynomial rolling hash mod a 30-bit prime, evaluated
with higher-order array functions on both sides (Spark: whole-stage
codegen'd `aggregate`/`transform`; DuckDB: `list_reduce`/
`list_transform`). All arithmetic stays below 2^63 so both engines
agree bit-for-bit.

Each helper returns a pair ``(spark_expr, duckdb_expr)`` as SQL
strings over a named input column — one definition, two engines, no
drift.

Scale: these are pure array expressions over already-tokenized rows
— embarrassingly parallel, no shuffle, no Python. A 100 TB corpus
pays exactly one pass.
"""

from __future__ import annotations

#: 30-bit prime modulus: keeps every intermediate < 2^63.
P = 1_000_000_007
BASE = 31
SEED = 7
#: Shingle mixing multipliers (any constants < P work).
C1 = 1_000_003
C2 = 999_983


def tokens(col: str) -> tuple[str, str]:
    """Whitespace tokenization, lowercased, empty tokens dropped."""
    spark = f"filter(split(lower({col}), ' '), x -> x != '')"
    duck = f"list_filter(string_split(lower({col}), ' '), x -> x != '')"
    return spark, duck


def word_hashes(words_col: str) -> tuple[str, str]:
    """Polynomial char hash of every word in an array column."""
    spark = (
        f"transform({words_col}, w -> aggregate(sequence(1, length(w)), "
        f"CAST({SEED} AS BIGINT), "
        f"(acc, i) -> (acc * {BASE} + ascii(substring(w, i, 1))) % {P}))"
    )
    duck = (
        f"list_transform({words_col}, w -> list_reduce("
        f"list_prepend(CAST({SEED} AS BIGINT), "
        f"list_transform(range(1, length(w) + 1), "
        f"i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))), "
        f"(acc, c) -> (acc * {BASE} + c) % {P}))"
    )
    return spark, duck


def char_fingerprint(col: str) -> tuple[str, str]:
    """Rolling hash over the full string (document fingerprint)."""
    spark = (
        f"aggregate(sequence(1, length({col})), CAST({SEED} AS BIGINT), "
        f"(acc, i) -> (acc * {BASE} + ascii(substring({col}, i, 1))) % {P})"
    )
    duck = (
        f"list_reduce(list_prepend(CAST({SEED} AS BIGINT), "
        f"list_transform(range(1, length({col}) + 1), "
        f"i -> CAST(ascii(substr({col}, i, 1)) AS BIGINT))), "
        f"(acc, c) -> (acc * {BASE} + c) % {P})"
    )
    return spark, duck


def shingle_hashes(whash_col: str, k: int = 3) -> tuple[str, str]:
    """Hashes of word-level k-shingles from an array of word hashes.

    ``sh[i] = (h[i]*C1^(k-1) + h[i+1]*C1^(k-2) + ... + h[i+k-1]) % P``
    with per-term mod so every intermediate stays < k * P^2 < 2^63.
    Short docs (< k words) yield an empty array on both engines.
    """
    # constant multipliers C1^(k-1-j) % P, j = 0..k-1
    mults = [pow(C1, k - 1 - j, P) for j in range(k)]

    def terms(idx: callable) -> str:
        return " + ".join(
            f"({idx(j)} * {mults[j]}) % {P}" for j in range(k)
        )

    spark = (
        f"CASE WHEN size({whash_col}) >= {k} THEN "
        f"transform(sequence(1, size({whash_col}) - {k - 1}), "
        f"i -> ({terms(lambda j: f'element_at({whash_col}, i + {j})')}) % {P}) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    duck = (
        f"CASE WHEN len({whash_col}) >= {k} THEN "
        f"list_transform(range(1, len({whash_col}) - {k - 2}), "
        f"i -> ({terms(lambda j: f'{whash_col}[i + {j}]')}) % {P}) "
        f"ELSE [] END"
    )
    return spark, duck


#: (a, b) parameters for the universal-hash minhash permutations
#: h_j(x) = (a_j * x + b_j) % P. Deterministic, engine-independent.
MINHASH_PERMS: tuple[tuple[int, int], ...] = tuple(
    ((17 + 13 * j) * 104_729 % P, (29 + 31 * j) * 15_485_863 % P) for j in range(8)
)


def minhash(sh_col: str, j: int) -> tuple[str, str]:
    """j-th minhash of an array of shingle hashes (NULL if empty)."""
    a, b = MINHASH_PERMS[j]
    spark = f"array_min(transform({sh_col}, s -> (s * {a} + {b}) % {P}))"
    duck = f"list_min(list_transform({sh_col}, s -> (s * {a} + {b}) % {P}))"
    return spark, duck


def simhash32(whash_col: str) -> tuple[str, str]:
    """32-bit SimHash over word hashes.

    Bit b is set when more than half the tokens have bit b set in
    their hash. ``floor(h / 2^b)`` is an exact power-of-two division
    for h < 2^30, so both engines compute identical bits.
    """
    spark = (
        f"aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, b) -> acc + "
        f"IF(2 * size(filter({whash_col}, "
        f"h -> CAST(floor(h / power(2, b)) AS BIGINT) % 2 = 1)) > size({whash_col}), "
        f"CAST(power(2, b) AS BIGINT), CAST(0 AS BIGINT)))"
    )
    duck = (
        f"CAST(list_sum(list_transform(range(0, 32), b -> "
        f"CASE WHEN 2 * len(list_filter({whash_col}, "
        f"h -> CAST(floor(h / power(2, b)) AS BIGINT) % 2 = 1)) > len({whash_col}) "
        f"THEN CAST(power(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
    )
    return spark, duck


# ---------------------------------------------------------------------------
# Vectorized (numpy) equivalents — the Spark-side fast path
# ---------------------------------------------------------------------------
# The SQL spellings above are interpreted per element by both engines;
# DuckDB keeps them as its oracle definition, but on the Spark side the
# higher-order folds measured 2-4s/query at sf0.1 (no codegen for
# lambda functions). These compute THE SAME integer arithmetic —
# modular integer math is exact in any evaluation order, so parity is
# trivial — vectorized over Arrow batches for use in pandas UDFs.
# Tokenization parity: str.lower().split(' ') with empties dropped ==
# filter(split(lower(col), ' '), x -> x != '') == DuckDB list_filter.

import numpy as np

#: Sorted multiplier/offset arrays for np_minhash_signature.
_MH_A = None
_MH_B = None


def np_word_hashes(texts) -> list:
    """Per-document arrays of word hashes (None for NULL text).

    One padded char-code matrix for the whole batch: the polynomial
    Horner runs as ~max_word_len vectorized steps over every word of
    every document at once."""
    counts: list[int | None] = []
    all_words: list[str] = []
    for t in texts:
        if t is None:
            counts.append(None)
            continue
        ws = [w for w in t.lower().split(" ") if w]
        counts.append(len(ws))
        all_words.extend(ws)
    hashes = (
        _horner_fold(all_words) if all_words else np.empty(0, dtype=np.int64)
    )
    out: list = []
    pos = 0
    for cnt in counts:
        if cnt is None:
            out.append(None)
        else:
            out.append(hashes[pos : pos + cnt])
            pos += cnt
    return out


def np_char_fingerprints(texts) -> list:
    """Rolling hash over each document's raw text (None for NULL).
    NOTE: defined over the actual characters (like the DuckDB oracle);
    for the empty string this is SEED, where the legacy Spark
    `sequence(1, 0)` spelling would mis-fold — the corpus has no empty
    texts, and this version is the correct one."""
    idx = [i for i, t in enumerate(texts) if t is not None]
    out: list = [None] * len(list(texts))
    if not idx:
        return out
    acc = _horner_fold([texts[i] for i in idx])
    for j, i in enumerate(idx):
        out[i] = int(acc[j])
    return out


def _horner_fold(strings: list) -> "np.ndarray":
    """The shared vectorized polynomial core: one padded char-code
    matrix, ~max_len masked Horner steps — identical modular algebra
    for word hashes and document fingerprints (a single definition so
    the two can never drift apart)."""
    n = len(strings)
    lens = np.fromiter((len(s) for s in strings), np.int64, n)
    width = int(lens.max()) if n else 0
    mat = np.zeros((n, width), dtype=np.int64)
    for i, s in enumerate(strings):
        if s:
            mat[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            )
    acc = np.full(n, SEED, dtype=np.int64)
    for c in range(width):
        acc = np.where(lens > c, (acc * BASE + mat[:, c]) % P, acc)
    return acc


def np_shingle_hashes(wh: "np.ndarray", k: int) -> "np.ndarray":
    """k-shingle hashes of a word-hash array (empty if < k words)."""
    m = len(wh)
    if m < k:
        return np.empty(0, dtype=np.int64)
    mults = [pow(C1, k - 1 - j, P) for j in range(k)]
    acc = np.zeros(m - k + 1, dtype=np.int64)
    for j in range(k):
        acc += (wh[j : m - k + 1 + j] * mults[j]) % P
    return acc % P


def np_minhash_signature(sh: "np.ndarray"):
    """All MINHASH_PERMS minhashes at once (None if no shingles)."""
    global _MH_A, _MH_B
    if _MH_A is None:
        _MH_A = np.array([a for a, _ in MINHASH_PERMS], dtype=np.int64)
        _MH_B = np.array([b for _, b in MINHASH_PERMS], dtype=np.int64)
    if sh.size == 0:
        return None
    return ((sh[:, None] * _MH_A + _MH_B) % P).min(axis=0)


def np_simhash32(wh: "np.ndarray") -> int:
    """32-bit SimHash (0 for an empty token list, like the SQL)."""
    if wh.size == 0:
        return 0
    bits = (wh[:, None] >> np.arange(32, dtype=np.int64)) & 1
    maj = 2 * bits.sum(axis=0) > wh.size
    return int((maj * (np.int64(1) << np.arange(32, dtype=np.int64))).sum())

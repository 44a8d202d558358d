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

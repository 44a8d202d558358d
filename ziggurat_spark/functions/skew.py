"""Skew mitigation: salted joins and two-phase aggregation.

The reference never faces key skew (its parallelism is partition-
bound and keys are Kafka record keys — doc/CONCEPTS.md:22-31); at
100 TB a hot join key or group key is routine. First line of defense
is AQE (`spark.sql.adaptive.skewJoin.enabled`, on in session.py);
these helpers cover the cases AQE can't re-plan:

- `salted_join`: shuffled joins where one side has hot keys and the
  other side is too big to broadcast but small enough to replicate
  per-salt. The hot side gets a random salt in [0, k); the other
  side is exploded k ways; the join key becomes (key, salt), fanning
  each hot key over k reducers.
- `salted_agg`: two-phase aggregation — partial on (keys, salt),
  final on keys. Spark's hash aggregate already does map-side
  partials, so this matters only when a single group's partials
  still hot-spot one reducer (e.g. extreme cardinality-1 groups
  under sort-based fallback, or stream-stream state).

Both preserve exact results for the supported algebraic aggregates
(count/sum/min/max: associative and commutative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "count": lambda c: F.count(c if c is not None else F.lit(1)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
_FINAL = {
    "count": F.sum,  # counts combine by summing
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot values of ``on``.

    ``other`` is replicated ``salt_buckets`` times (size its memory
    accordingly — this is the explicit tradeoff vs one hot reducer).
    Output columns = skewed's columns + other's non-key columns.
    """
    if salt_buckets < 2:
        raise ValueError("salt_buckets must be >= 2")
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        # the replicated side's unmatched rows would survive once per
        # salt bucket under right/full joins — silently wrong results
        raise ValueError(
            f"salted_join does not support how={how!r}: replicating "
            "`other` duplicates its unmatched rows under right/full "
            "outer joins; salt the other side instead"
        )
    salted = skewed.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted.join(replicated, [on, "_salt"], how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str | None]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name →
    (fn, column) with fn in {count, sum, min, max} (column ignored
    for count)."""
    bad = [name for name, (fn, _) in aggs.items() if fn not in _PARTIAL]
    if bad:
        raise ValueError(f"unsupported aggregate(s): {bad}")
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _PARTIAL[fn](F.col(col) if col else None).alias(f"_p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _FINAL[fn](F.col(f"_p_{name}")).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )

"""Skew helpers: salted join/agg must produce EXACTLY the unsalted
results (algebraic aggregates, replicated build side) while spreading
hot keys across reducers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ziggurat_spark.functions.skew import salted_agg, salted_join
from ziggurat_spark.tables import load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one key — the classic hot-key shape
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.range(0, 10_000, 500).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    plain = skewed.join(dim, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw")
    )
    salted = salted_join(skewed, dim, "k", salt_buckets=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw")
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_validates(skewed):
    with pytest.raises(ValueError):
        salted_join(skewed, skewed, "k", salt_buckets=1)


def test_salted_agg_matches_plain(spark, skewed):
    plain = skewed.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    salted = salted_agg(
        skewed,
        ["k"],
        {
            "n": ("count", None),
            "sv": ("sum", "v"),
            "mn": ("min", "v"),
            "mx": ("max", "v"),
        },
        salt_buckets=8,
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_agg_rejects_nonalgebraic(skewed):
    with pytest.raises(ValueError, match="unsupported"):
        salted_agg(skewed, ["k"], {"a": ("avg", "v")})


def test_salted_agg_on_real_table(spark):
    e = load_table(spark, SF, "events")
    plain = e.groupBy("event_type").agg(F.count("*").alias("n"))
    salted = salted_agg(e, ["event_type"], {"n": ("count", None)})
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_rejects_outer(skewed):
    """right/full joins would duplicate the replicated side's
    unmatched rows once per salt bucket — rejected loudly."""
    import pytest

    from ziggurat_spark.functions.skew import salted_join

    other = skewed.select("k").distinct()
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(skewed, other, "k", how=how)


def test_salted_join_actually_salts(spark, skewed):
    """The salt mechanics must be real, not a pass-through equi-join:
    the physical plan joins on (k, _salt) and replicates the build
    side across salt buckets."""
    from ziggurat_spark.functions.skew import salted_join
    from ziggurat_spark.plans import formatted_plan

    other = skewed.select("k").distinct().withColumn(
        "payload", F.col("k") * 10
    )
    out = salted_join(skewed, other, "k", salt_buckets=4)
    plan = formatted_plan(out)
    assert "_salt" in plan  # join key carries the salt
    assert "explode" in plan.lower()  # build side replicated per bucket

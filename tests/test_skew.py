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


# -- hot-bucket guard for fingerprint retrieval (round 3) ---------------


def test_simhash_hot_bucket_salting_bounds_tasks(spark, tmp_path):
    """Adversarial corpus: 1500 IDENTICAL documents → every simhash
    fingerprint equal → one (band, half) bucket holds the entire
    corpus. The salt-group guard must (1) still emit exactly the
    C(1500,2) Hamming-0 pairs, and (2) split the mega-bucket into
    group-pair tasks none of which exceeds ~2·cap rows — bounded
    per-task memory instead of one O(n²) matrix."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ziggurat_spark.queries.dedup import (
        SIMHASH_BAND_BITS,
        SIMHASH_BAND_MASK,
        SIMHASH_BANDS,
        SIMHASH_BUCKET_CAP,
        _salted_bucket_hamming_pairs,
    )
    from ziggurat_spark.queries.registry import all_queries

    n = 1500
    d = tmp_path / "hot"
    d.mkdir()
    pd.DataFrame(
        {
            "doc_id": range(n),
            "text": ["the same boilerplate text repeated verbatim"] * n,
            "lang": ["en"] * n,
            "source": ["web"] * n,
            "n_chars": [44] * n,
        }
    ).to_parquet(str(d / "documents.parquet"))

    out = all_queries()["x_simhash_hamming_pairs"].spark(spark, str(d))
    assert out.count() == n * (n - 1) // 2

    # bucket-shape audit: rebuild the salted buckets the query uses
    # and assert the widest task is bounded by the cap (×2 for a
    # cross bucket holding two groups, small margin for hash skew)
    from ziggurat_spark.functions import texthash_udfs as THU
    from ziggurat_spark.tables import load_table

    sims = load_table(spark, str(d), "documents").select(
        "doc_id", THU.simhash_udf()("text").alias("h")
    )
    bands = None
    for b in range(SIMHASH_BANDS):
        part = sims.select(
            "doc_id",
            "h",
            F.lit(b).alias("band"),
            F.expr(
                f"(h >> {SIMHASH_BAND_BITS * b}) & {SIMHASH_BAND_MASK}"
            ).alias("byte"),
        )
        bands = part if bands is None else bands.unionAll(part)

    from pyspark.sql import Window

    n_in_bucket = F.count("*").over(Window.partitionBy("band", "byte"))
    salted = (
        bands.withColumn(
            "g", F.ceil(n_in_bucket / F.lit(SIMHASH_BUCKET_CAP)).cast("int")
        )
        .withColumn("s", F.pmod(F.xxhash64("doc_id"), F.col("g")).cast("int"))
        .select(
            "band",
            "byte",
            "s",
            F.explode(
                F.expr(
                    "transform(sequence(0, g - 1), "
                    "j -> struct(least(s, j) AS gi, greatest(s, j) AS gj))"
                )
            ).alias("gp"),
        )
        .select("band", "byte", "gp.gi", "gp.gj")
    )
    widths = (
        salted.groupBy("band", "byte", "gi", "gj")
        .count()
        .agg(F.max("count").alias("mx"), F.count("*").alias("n_tasks"))
        .collect()[0]
    )
    # n=1500, cap=1024 → g=2 → 3 group-pairs per band, each ≤ ~2·cap
    assert widths["mx"] <= int(2.5 * SIMHASH_BUCKET_CAP)
    assert widths["n_tasks"] >= 3 * SIMHASH_BANDS

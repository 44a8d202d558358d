"""Set operations + exact dedup (Z24–Z25).

The reference has no set operators; these are part of the declared
query-capability superset. Exact dedup is the batch form of the
"process each message once" guarantee a dead-set replay needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


@register(
    "z24_set_ops",
    oracle=(
        "SELECT user_id, 'both' AS side FROM ("
        "  SELECT user_id FROM events WHERE event_type = 'click' "
        "  INTERSECT SELECT user_id FROM events WHERE event_type = 'view') i "
        "UNION ALL "
        "SELECT user_id, 'click_only' AS side FROM ("
        "  SELECT user_id FROM events WHERE event_type = 'click' "
        "  EXCEPT SELECT user_id FROM events WHERE event_type = 'view') e "
        "ORDER BY side, user_id"
    ),
    doc="INTERSECT / EXCEPT / UNION ALL in one checkable result.",
    tags=("setop",),
)
def z24(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    views = e.filter(F.col("event_type") == "view").select("user_id")
    both = clicks.intersect(views).select("user_id", F.lit("both").alias("side"))
    click_only = clicks.subtract(views).select(
        "user_id", F.lit("click_only").alias("side")
    )
    return both.unionAll(click_only).orderBy("side", "user_id")


@register(
    "z25_exact_dedup",
    oracle=(
        "SELECT user_id, event_type, min(event_id) AS keeper "
        "FROM events GROUP BY user_id, event_type "
        "ORDER BY user_id, event_type"
    ),
    doc=(
        "Exact dedup with deterministic keeper selection: groupBy key "
        "+ min(id). (dropDuplicates keeps an arbitrary row — fine in "
        "production, not hash-checkable; this form is both "
        "deterministic and shuffle-equivalent.)"
    ),
    tags=("dedup",),
)
def z25(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("keeper"))
        .orderBy("user_id", "event_type")
    )


@register(
    "x_setops_all_variants",
    oracle=(
        "SELECT 'ia' AS op, count(*) AS n FROM ("
        "SELECT user_id FROM events WHERE event_type = 'click' "
        "INTERSECT ALL SELECT user_id FROM events WHERE event_type = 'view') "
        "UNION ALL "
        "SELECT 'ea' AS op, count(*) AS n FROM ("
        "SELECT user_id FROM events WHERE event_type = 'click' "
        "EXCEPT ALL SELECT user_id FROM events WHERE event_type = 'view') "
        "ORDER BY op"
    ),
    doc=(
        "Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL "
        "(multiplicity-preserving — min/difference of per-key "
        "counts, not the dedup the DISTINCT variants do). Spark "
        "spells them intersectAll/exceptAll on the DataFrame; the "
        "plan is a count-aggregated join, one shuffle per side — "
        "the same shape at any scale."
    ),
    tags=("setops",),
)
def x_setops_all_variants(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    views = e.filter(F.col("event_type") == "view").select("user_id")
    ia = (
        clicks.intersectAll(views)
        .agg(F.count("*").alias("n"))
        .select(F.lit("ia").alias("op"), "n")
    )
    ea = (
        clicks.exceptAll(views)
        .agg(F.count("*").alias("n"))
        .select(F.lit("ea").alias("op"), "n")
    )
    return ia.unionAll(ea).orderBy("op")

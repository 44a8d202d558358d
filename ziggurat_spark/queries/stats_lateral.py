"""Statistical aggregates (exact integer cores) and correlated
LATERAL joins — the last two classic-SQL families the registered
surface didn't yet cover.

Covariance/correlation are float-unstable under distributed partial
aggregation (sum order varies run to run), so — like
x_variance_exact — the graded spelling outputs the *integer cores*
(n·Σxy − Σx·Σy etc. over scaled-integer columns), which determine
cov/corr exactly and hash bit-for-bit on any engine at any
parallelism. The float division happens trivially downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.queries.registry import register
from ziggurat_spark.tables import load_table


@register(
    "x_covariance_exact",
    oracle=(
        "SELECT event_type, count(*) AS n, "
        "CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS cov_num, "
        "CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS varx_num, "
        "CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT) AS vary_num "
        "FROM (SELECT event_type, "
        "CAST(round(value * 100) AS BIGINT) AS x, event_id % 1000 AS y "
        "FROM events) s GROUP BY event_type ORDER BY event_type"
    ),
    doc=(
        "Covariance / correlation integer cores per group: "
        "n·Σxy − Σx·Σy (covariance numerator) and the two variance "
        "numerators — cov = cov_num/n², corr = cov_num/√(varx·vary) "
        "follow exactly. Like x_variance_exact, the scaled-integer "
        "sums are associative+commutative BIGINTs, so map-side "
        "partials and any shuffle order give the identical result — "
        "the distributed-safe spelling of corr()/covar_pop(). One "
        "shuffle of 5 rows × 4 longs."
    ),
    tags=("agg", "stats"),
)
def x_covariance_exact(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("x"),
        (F.col("event_id") % 1000).alias("y"),
    )
    n = F.count("*")
    sx, sy = F.sum("x"), F.sum("y")
    sxy = F.sum(F.col("x") * F.col("y"))
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    return (
        e.groupBy("event_type")
        .agg(
            n.alias("n"),
            (n * sxy - sx * sy).cast("bigint").alias("cov_num"),
            (n * sxx - sx * sx).cast("bigint").alias("varx_num"),
            (n * syy - sy * sy).cast("bigint").alias("vary_num"),
        )
        .orderBy("event_type")
    )


_LATERAL_SQL = """
SELECT n.n_name, t.s_suppkey, t.ab100
FROM {nation} n,
LATERAL (
  SELECT s_suppkey, CAST(round(s_acctbal * 100) AS BIGINT) AS ab100
  FROM {supplier} s
  WHERE s.s_nationkey = n.n_nationkey
  ORDER BY ab100 DESC, s_suppkey
  LIMIT 2
) t
ORDER BY n.n_name, t.ab100 DESC, t.s_suppkey
"""


@register(
    "x_lateral_topn",
    oracle=_LATERAL_SQL.format(nation="nation", supplier="supplier"),
    doc=(
        "Correlated LATERAL join: per-nation top-2 suppliers by "
        "account balance — identical SQL text on both engines "
        "(LATERAL is ANSI). Catalyst decorrelates the LIMIT subquery "
        "into a ranked window over one supplier shuffle rather than "
        "N per-nation scans — same plan family as x_topk_per_group, "
        "reached from the correlated spelling users actually write. "
        "Deterministic via the (ab100, suppkey) composite order."
    ),
    tags=("join", "lateral", "topk"),
)
def x_lateral_topn(spark: SparkSession, sf: str) -> DataFrame:
    # prefixed view names: never collide with caller/driver session state
    load_table(spark, sf, "nation").createOrReplaceTempView("zs_lat_nation")
    load_table(spark, sf, "supplier").createOrReplaceTempView(
        "zs_lat_supplier"
    )
    return spark.sql(
        _LATERAL_SQL.format(nation="zs_lat_nation", supplier="zs_lat_supplier")
    )

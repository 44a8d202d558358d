"""Distributed global ranking — the partition-offset construction.

A bare global window (``row_number() OVER (ORDER BY ...)``) moves the
entire input into ONE task's sort; this helper computes the identical
total-order rank fully in parallel:

1. ``repartitionByRange`` on the order columns (ascending partition
   ids hold ascending ranges),
2. per-partition ``row_number`` over the same order,
3. per-partition counts → cumulative offsets (a window over the
   O(partitions)-row counts table, not the data),
4. ``rank = row_number + offset(partition)``, via a broadcast join.

The range-shuffled input is materialized once with a lazy
``localCheckpoint`` — load-bearing: partition ids must not be
recomputed differently across the rank pass and any auxiliary
aggregate the caller derives, and the two passes (counts + ranks)
must share one shuffle. Used by x_equidepth_histogram and
x_grouped_median_scale (SCALE.md §10g).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_rank(
    df: DataFrame, order_cols: list[str], out_col: str = "grank"
) -> tuple[DataFrame, DataFrame]:
    """Return ``(ranked, parts)``: ``ranked`` is ``parts`` plus the
    1-based global rank over ``order_cols`` (which must form a total
    order — include a unique tiebreaker); ``parts`` is the
    checkpointed range-partitioned input for auxiliary aggregates
    that should reuse the materialized shuffle instead of
    re-evaluating the rank subtree."""
    parts = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.expr("spark_partition_id()"))
        .localCheckpoint(eager=False)
    )
    counts = parts.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off"),
    )
    wp = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked = (
        parts.withColumn("_rn", F.row_number().over(wp))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_rn") + F.col("_off"))
        .drop("_pid", "_rn", "_off")
    )
    return ranked, parts.drop("_pid")


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
) -> tuple[DataFrame, DataFrame]:
    """Distributed running total over a total order — the cumulative
    twin of :func:`global_rank`: per-partition running sums plus
    partition-SUM offsets, so no single task ever sorts or scans the
    whole input. Returns ``(with_cumsum, parts)`` like global_rank."""
    parts = (
        df.repartitionByRange(*order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.expr("spark_partition_id()"))
        .localCheckpoint(eager=False)
    )
    totals = parts.groupBy("_pid").agg(F.sum(value_col).alias("_psum"))
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_psum").over(woff), F.lit(0)).alias("_off"),
    )
    wrun = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        parts.withColumn("_run", F.sum(value_col).over(wrun))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_run") + F.col("_off"))
        .drop("_pid", "_run", "_off")
    )
    return out, parts.drop("_pid")

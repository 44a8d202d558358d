"""Scale-shape operators: distributed spellings of patterns that are
correct-but-serial when written naively.

`two_level_prefix_sum` — a per-group cumulative sum
(``SUM(v) OVER (PARTITION BY g ORDER BY o ROWS UNBOUNDED
PRECEDING)``) is the workhorse of budget fills, sequence packing and
shard assignment, but the naive window serializes EACH GROUP into one
sort task: a corpus where one source holds 50 TB runs that source's
entire cumsum on a single executor core. The classic fix (the
textbook parallel scan, e.g. Blelloch '90) splits each group into
RANGE shards of the ordering key, computes in-shard window cumsums
(parallel across group×shard), aggregates one row per (group, shard)
into an offset table — tiny, broadcastable — and adds each shard's
prior-shard mass back. Because shards are RANGE buckets of the
leading order column, ``(shard ASC, order ASC)`` is exactly the
original order, so the result is bit-identical to the single-window
spelling (the DuckDB oracles keep the one-window form; parity proves
the equivalence on every run).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def two_level_prefix_sum(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    val_col: str,
    shard_expr: Column,
    out_col: str = "cum",
) -> DataFrame:
    """Cumulative sum of ``val_col`` over ``PARTITION BY part_cols
    ORDER BY order_cols`` computed shard-parallel.

    ``shard_expr`` MUST be a monotone range-bucketing of the leading
    order column (equal order prefix → equal shard; order asc →
    shard asc), otherwise the reconstruction is wrong. Typical
    spellings: ``(hb * 16) div (hb_modulus)`` for an integer hash
    column, ``substring(hex_key, 1, 1)`` for a lowercase hex string.

    Returns ``df`` plus ``out_col``; the internal shard/offset
    columns are dropped. The offset table carries one row per
    (group, shard) — broadcast it stays off the shuffle path.
    """
    d = df.withColumn("_shard", shard_expr)
    w_in = (
        W.partitionBy(*part_cols, "_shard")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_off = (
        W.partitionBy(*part_cols)
        .orderBy("_shard")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        d.groupBy(*part_cols, "_shard")
        .agg(F.sum(val_col).alias("_shard_sum"))
        .withColumn(
            "_off",
            F.coalesce(F.sum("_shard_sum").over(w_off), F.lit(0)),
        )
        .select(*part_cols, "_shard", "_off")
    )
    return (
        d.withColumn("_cum_in", F.sum(val_col).over(w_in))
        .join(F.broadcast(offsets), [*part_cols, "_shard"])
        .withColumn(out_col, F.col("_cum_in") + F.col("_off"))
        .drop("_shard", "_cum_in", "_off")
    )

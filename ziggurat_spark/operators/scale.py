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


#: internal column prefix — collision-resistant against caller frames
_TMP = "__zs_tlps_"


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

    NULL semantics: the offset join-back is NULL-SAFE on the
    partition keys (``<=>``), so a NULL partition-key value forms its
    own group exactly as the single-window ``PARTITION BY`` would —
    the two spellings stay bit-identical even on NULL-keyed rows.
    NULL ORDER values still sort wherever the window sort puts them;
    keep ``shard_expr`` consistent with that placement (a NULL shard
    compares as its own range bucket via the same null-safe key).

    Returns ``df`` plus ``out_col``; the internal shard/offset
    columns (``__zs_tlps_*``) are dropped and collision-checked
    against the caller's columns. The offset table carries one row
    per (group, shard) — broadcast it stays off the shuffle path.
    """
    c_shard, c_in, c_off = _TMP + "shard", _TMP + "cum_in", _TMP + "off"
    # reject ANY caller column in the temp namespace (not just the
    # ones this version happens to use): a caller column named e.g.
    # __zs_tlps_pshard would otherwise slip past an enumerated check
    # and hit an ambiguous-reference failure (or be silently dropped)
    for c in df.columns:
        if c.startswith(_TMP):
            raise ValueError(f"two_level_prefix_sum temp column clash: {c}")
    d = df.withColumn(c_shard, shard_expr)
    w_in = (
        W.partitionBy(*part_cols, c_shard)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_off = (
        W.partitionBy(*part_cols)
        .orderBy(c_shard)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # offset side renames its keys so the null-safe join condition is
    # unambiguous and nothing shadows the caller's columns
    offsets = (
        d.groupBy(*part_cols, c_shard)
        .agg(F.sum(val_col).alias(_TMP + "shard_sum"))
        .withColumn(
            c_off,
            F.coalesce(F.sum(_TMP + "shard_sum").over(w_off), F.lit(0)),
        )
        .select(
            *[F.col(p).alias(_TMP + "p" + p) for p in part_cols],
            F.col(c_shard).alias(_TMP + "pshard"),
            c_off,
        )
    )
    cond = F.col(c_shard).eqNullSafe(F.col(_TMP + "pshard"))
    for p in part_cols:
        cond = cond & F.col(p).eqNullSafe(F.col(_TMP + "p" + p))
    return (
        d.withColumn(c_in, F.sum(val_col).over(w_in))
        .join(F.broadcast(offsets), cond)
        .withColumn(out_col, F.col(c_in) + F.col(c_off))
        .drop(
            c_shard,
            c_in,
            c_off,
            _TMP + "pshard",
            *[_TMP + "p" + p for p in part_cols],
        )
    )

"""As-of joins — a relational operator Spark lacks natively.

No reference counterpart (its only joins are the windowed stream
joins J1-J4, streams.clj:134-179); this is the capability-superset
operator every event-time pipeline eventually needs: for each left
row, the latest right row with the same key whose timestamp is at or
before the left timestamp (backward), the earliest at or after
(forward), or the closest in either direction (nearest).

Spark-first implementation (SURVEY §7.2 tier (a): composition of
built-ins): tag and union both sides, then one window pass per key
ordered by (ts, tag) taking the last/first non-null right payload —
tag ordering makes the equal-timestamp match inclusive.

Scale shape: ONE shuffle on the key and ONE sort — state and output
are O(input), with no join fan-out. The naive spelling (theta-join
on ts <= ts, then max per left row) explodes to O(lefts x rights)
within each key group; this one never materializes pairs.

Determinism: if the right side can hold multiple rows per
(key, timestamp), pre-dedupe it (the operator takes the last one in
(timestamp) order within the window pass, which is not a total
order) — the oracle-checked query dedupes explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_INTERNAL = ("_ats", "_tag", "_r", "_rb", "_rf", "_mb", "_mf", "_mn", "_m")


def _resolve_rcols(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    right_ts: str,
    right_cols: list[str] | None,
    out_prefix: str,
) -> list[str]:
    """Default + validate the right payload columns: no collision
    with left columns (the output would carry two columns of the
    same name — AMBIGUOUS_REFERENCE downstream), no use of the
    operator's internal working names on either side."""
    rcols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    clash = [c for c in rcols if c in left.columns]
    if clash:
        raise ValueError(
            f"right column(s) {clash} collide with left columns — pass "
            "right_cols with renamed/aliased payload columns"
        )
    if f"{out_prefix}{right_ts}" in left.columns:
        raise ValueError(
            f"output column {out_prefix}{right_ts!r} collides with a "
            "left column"
        )
    reserved = [
        c
        for c in _INTERNAL
        if c in left.columns or c in right.columns
    ]
    if reserved:
        raise ValueError(
            f"column name(s) {reserved} are reserved by the as-of "
            "operator — rename them before joining"
        )
    return rcols


def _directional(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    rcols: list[str],
    backward: bool,
) -> DataFrame:
    """Shared union+window construction for backward/forward.

    Tag order makes the equal-timestamp match inclusive: backward
    sorts rights BEFORE lefts (right at left_ts is inside the
    preceding frame); forward sorts lefts before rights (right at
    left_ts is inside the following frame)."""
    r_tag, l_tag = (0, 1) if backward else (1, 0)
    r_part = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(r_tag).alias("_tag"),
        F.struct(
            F.col(right_ts).alias(right_ts), *[F.col(c) for c in rcols]
        ).alias("_r"),
    )
    l_part = left.select(
        *left.columns, F.col(left_ts).alias("_ats"), F.lit(l_tag).alias("_tag")
    )
    u = l_part.unionByName(r_part, allowMissingColumns=True)
    base = W.partitionBy(*on).orderBy("_ats", "_tag")
    if backward:
        w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
        picked = F.last("_r", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(W.currentRow, W.unboundedFollowing)
        picked = F.first("_r", ignorenulls=True).over(w)
    matched = u.withColumn("_m", picked)
    return matched.filter(F.col("_tag") == l_tag).select(
        *left.columns,
        *[F.col(f"_m.{right_ts}").alias(f"asof_{right_ts}")],
        *[F.col(f"_m.{c}").alias(c) for c in rcols],
    )


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right
    columns (NULL when the key has no right row at or before the
    left timestamp). ``right_cols`` defaults to right's non-key,
    non-timestamp columns."""
    rcols = _resolve_rcols(left, right, on, right_ts, right_cols, "asof_")
    return _directional(left, right, on, left_ts, right_ts, rcols, True)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Forward as-of join: every left row, plus the EARLIEST right
    row with the same key at or after the left timestamp (NULL when
    none). Mirror image of :func:`asof_join_backward` — same
    union+window plan with the frame looking forward; same scale
    shape (one shuffle on the key, one sort, zero pair fan-out)."""
    rcols = _resolve_rcols(left, right, on, right_ts, right_cols, "asof_")
    return _directional(left, right, on, left_ts, right_ts, rcols, False)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """Nearest as-of join: every left row, plus the right row with
    the same key whose timestamp is CLOSEST in either direction
    (ties go backward, pandas.merge_asof direction='nearest'
    semantics). Optional ``tolerance_s`` nulls out matches farther
    than that many seconds.

    Single-pass spelling: right rows enter the union TWICE — tagged
    0 (visible to the backward frame) and 2 (visible to the forward
    frame) with lefts tagged 1 between them — so one shuffle + one
    sort serves both directions; at equal timestamps both frames
    include the right row (inclusive match both ways). Union size is
    L + 2R, still O(input) with zero pair fan-out.
    """
    rcols = _resolve_rcols(left, right, on, right_ts, right_cols, "nearest_")
    payload = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c) for c in rcols]
    )
    r_back = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_tag"),
        payload.alias("_rb"),
    )
    r_fwd = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(2).alias("_tag"),
        payload.alias("_rf"),
    )
    l_part = left.select(
        *left.columns, F.col(left_ts).alias("_ats"), F.lit(1).alias("_tag")
    )
    u = l_part.unionByName(r_back, allowMissingColumns=True).unionByName(
        r_fwd, allowMissingColumns=True
    )
    wb = (
        W.partitionBy(*on)
        .orderBy("_ats", "_tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(*on)
        .orderBy("_ats", "_tag")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    m = (
        u.withColumn("_mb", F.last("_rb", ignorenulls=True).over(wb))
        .withColumn("_mf", F.first("_rf", ignorenulls=True).over(wf))
        .filter(F.col("_tag") == 1)
    )
    lts = F.col(left_ts).cast("timestamp")
    bdiff = F.unix_micros(lts) - F.unix_micros(
        F.col(f"_mb.{right_ts}").cast("timestamp")
    )
    fdiff = F.unix_micros(
        F.col(f"_mf.{right_ts}").cast("timestamp")
    ) - F.unix_micros(lts)
    if tolerance_s is not None:
        tol = tolerance_s * 1_000_000
        m = m.withColumn(
            "_mb", F.when(bdiff <= tol, F.col("_mb"))
        ).withColumn("_mf", F.when(fdiff <= tol, F.col("_mf")))
    take_back = F.col("_mb").isNotNull() & (
        F.col("_mf").isNull() | (bdiff <= fdiff)
    )
    nearest = F.when(take_back, F.col("_mb")).otherwise(F.col("_mf"))
    m = m.withColumn("_mn", nearest)
    return m.select(
        *left.columns,
        *[F.col(f"_mn.{right_ts}").alias(f"nearest_{right_ts}")],
        *[F.col(f"_mn.{c}").alias(c) for c in rcols],
    )

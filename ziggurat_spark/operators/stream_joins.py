"""Windowed stream-stream joins — J1–J4, the reference's only
relational operators (streams.clj:134-179).

Kafka Streams `JoinWindows.of(w)` joins records with EQUAL KEYS whose
timestamps differ by at most ±w, emitting `{topic-key-1 left-value,
topic-key-2 right-value}` (ValueJoiner streams.clj:151-153), with
inner/left/outer selected by config (:156-158) and an N-way chain
reducing pairwise over :input-topics (:163-179).

Spark-first: an equi-join on key with a time-band residual predicate
under `withWatermark` on both sides. Structured Streaming keeps both
sides' state and evicts it at the watermark — the same state-store
windowing Kafka Streams does internally, but with the eviction bound
explicit. Outer rows emit when the watermark closes the window
(eventually-equal semantics vs Kafka Streams' eager emission —
SURVEY §7.3; tests drain with availableNow).

Scale: the join is keyed — both sides shuffle on (key) and the band
predicate prunes within key groups; state size is bounded by
watermark horizon × ingest rate, independent of total history.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

JOIN_TYPES = {"inner": "inner", "left": "leftOuter", "outer": "fullOuter"}


def _carries_watermark(df: DataFrame, ts_col: str) -> bool:
    """True if ``ts_col`` is already an event-time column (its
    watermark survives projection as column metadata). Re-applying
    withWatermark to such a column is a redefinition error in a
    chained stream-stream join (J4's hop 2+, where the band timestamp
    is extracted from the accumulated struct)."""
    try:
        meta = df.schema[ts_col].metadata
    except KeyError:
        return False
    return bool(meta) and "spark.watermarkDelayMs" in meta




def windowed_join(
    left: DataFrame,
    right: DataFrame,
    join_window_ms: int,
    join_type: str = "inner",
    key_col: str = "key",
    ts_col: str = "timestamp",
    left_name: str = "left",
    right_name: str = "right",
    watermark: str | None = None,
    keep_band: bool = False,
) -> DataFrame:
    """J1/J2/J3: one windowed pair join.

    Emits ``{<left_name> STRUCT, <right_name> STRUCT}`` — the Spark
    spelling of the ValueJoiner's {topic-key-1 ... topic-key-2 ...}
    map. ``watermark`` (e.g. "10 seconds") defaults to the join
    window; outer joins REQUIRE it (Spark enforces this, matching the
    semantics the reference gets implicitly from window retention).

    The emitted structs carry metadata-FREE fields (the event-time
    tag must not leak through struct extraction — a downstream
    stateful operator would see two event-time columns); the band
    key/timestamp live as separate top-level columns, and
    ``keep_band=True`` keeps them in the output as ``_band_key`` /
    ``_band_ts`` with the left side's watermark tag intact. That
    tagged column is how a J4 chain hop hands its watermark to the
    next hop — re-applying withWatermark downstream of a join is a
    redefinition error, so propagation is the only route.
    """
    if join_type not in JOIN_TYPES:
        raise ValueError(
            f"join_type must be one of {sorted(JOIN_TYPES)} "
            "(:join-cfg :join-type)"
        )
    # watermark must cover the FULL band: milliseconds verbatim, never
    # floored to seconds (a 2500ms window with a 2s watermark could
    # evict in-band state before the band closes)
    wm = watermark or f"{max(join_window_ms, 1)} milliseconds"
    l = left
    r = right
    if l.isStreaming and not _carries_watermark(l, ts_col):
        l = l.withWatermark(ts_col, wm)
    if r.isStreaming and not _carries_watermark(r, ts_col):
        r = r.withWatermark(ts_col, wm)
    l = l.select(
        F.struct(
            *[F.col(c).alias(c, metadata={}) for c in l.columns]
        ).alias(left_name),
        F.col(key_col).alias("_lk"),
        F.col(ts_col).alias("_lt"),
    )
    r = r.select(
        F.struct(
            *[F.col(c).alias(c, metadata={}) for c in r.columns]
        ).alias(right_name),
        F.col(key_col).alias("_rk"),
        F.col(ts_col).alias("_rt"),
    )
    band = F.expr(
        f"_rt BETWEEN _lt - INTERVAL {join_window_ms} MILLISECONDS "
        f"AND _lt + INTERVAL {join_window_ms} MILLISECONDS"
    )
    joined = l.join(r, (F.col("_lk") == F.col("_rk")) & band, JOIN_TYPES[join_type])
    if keep_band:
        return joined.select(
            left_name,
            right_name,
            F.col("_lk").alias("_band_key"),
            F.col("_lt").alias("_band_ts"),
        )
    return joined.select(left_name, right_name)


def windowed_join_chain(
    streams: list[tuple[str, DataFrame]],
    join_window_ms: int,
    join_type: str = "inner",
    key_col: str = "key",
    ts_col: str = "timestamp",
) -> DataFrame:
    """J4 N-way chain (streams.clj:163-179): reduce pairwise, join
    config taken from the left element — the chained result keeps the
    previous pair as the nested ``left`` struct, mirroring how the
    reference's reduce accumulates {k1 v1, k2 v2} maps.

    For the chained hops the *left* side's ordering timestamp is the
    left stream's own event time (carried through as ``_chain_ts``).
    """
    if len(streams) < 2:
        raise ValueError(":input-topics needs at least two streams")

    # Accumulator: flat DataFrame with (key, ts) carried from the
    # FIRST stream (cfg taken from the left element, streams.clj:175)
    # plus one struct column per already-joined stream. The carried
    # (key, ts) are the join's _band_* outputs — direct aliases of
    # stream 1's watermarked attribute, so each hop's tagged event
    # time PROPAGATES to the next (withWatermark cannot be re-applied
    # downstream of a stateful operator).
    (name0, df0), (name1, df1) = streams[0], streams[1]
    acc = windowed_join(
        df0, df1, join_window_ms, join_type,
        key_col=key_col, ts_col=ts_col, left_name=name0, right_name=name1,
        keep_band=True,
    ).withColumnsRenamed({"_band_key": key_col, "_band_ts": ts_col})
    joined_names = [name0, name1]
    for rname, rdf in streams[2:]:
        step = windowed_join(
            acc, rdf, join_window_ms, join_type,
            key_col=key_col, ts_col=ts_col, left_name="_acc", right_name=rname,
            keep_band=True,
        )
        acc = step.select(
            *[F.col(f"_acc.{n}").alias(n) for n in joined_names],
            F.col(rname),
            F.col("_band_key").alias(key_col),
            F.col("_band_ts").alias(ts_col),
        )
        joined_names.append(rname)
    return acc.select(*joined_names)


def pair_timestamp_diff_ms(
    joined: DataFrame,
    left_name: str = "left",
    right_name: str = "right",
    ts_col: str = "timestamp",
) -> Column:
    """T9 joined-pair delay metric (stream_joins_diff.clj:5-17):
    |left.ts − right.ts| in ms, for `df.observe(avg(...))`."""
    lt = F.unix_millis(F.col(f"{left_name}.{ts_col}").cast("timestamp"))
    rt = F.unix_millis(F.col(f"{right_name}.{ts_col}").cast("timestamp"))
    return F.abs(lt - rt)

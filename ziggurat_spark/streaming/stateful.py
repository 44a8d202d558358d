"""Stateful streaming operators.

The reference is stateless by design ("framework to build stateless
applications on kafka", project.clj:6) — retry counts travel in the
message, not in a store (producer.clj:288-293), and its delivery is
at-least-once (SURVEY §2.1 checklist). These operators are the
capability superset that makes at-least-once livable at scale:

- `streaming_dedup`: built-in watermarked dropDuplicates — turns
  redelivery (retry pump, replay, restart) into effectively-once
  per key within the watermark horizon. State is bounded by
  horizon × key cardinality and evicted by the watermark.
- `keyed_running_counts`: custom per-key accumulator via
  `applyInPandasWithState` (Arrow-batched, GroupState-backed) — the
  pattern for any operator Spark's built-ins can't express (the
  (b)-tier of SURVEY §7.2's decision table). Emits the updated
  count for every key seen in each micro-batch; idle keys expire
  via processing-time timeout.

Scale: both shuffle once on the key to co-locate state; state lives
in the checkpointed state store (RocksDB on a real cluster), never
on the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "timestamp",
    watermark: str = "1 hour",
) -> DataFrame:
    """Effectively-once delivery: drop records whose ``keys`` were
    already seen within the watermark horizon. On a batch DataFrame
    this degrades to plain dropDuplicates (same columns)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return df.dropDuplicates(keys)


def keyed_running_counts(
    df: DataFrame,
    key_col: str,
    state_timeout_ms: int = 0,
) -> DataFrame:
    """Per-key running record counts across micro-batches.

    Output: one row per key per micro-batch in which the key
    appeared: ``(key STRING, batch_rows LONG, total_rows LONG)``.
    ``state_timeout_ms > 0`` expires idle keys (their next appearance
    restarts the count from zero) via processing-time timeout.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        batch_rows = sum(len(p) for p in pdfs)
        (total,) = state.get if state.exists else (0,)
        total += batch_rows
        state.update((total,))
        if state_timeout_ms > 0:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "batch_rows": [batch_rows],
                "total_rows": [total],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key string, batch_rows long, total_rows long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=timeout,
    )

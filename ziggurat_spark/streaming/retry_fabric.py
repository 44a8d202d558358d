"""The retry / dead-set fabric — RabbitMQ topology re-expressed as tables.

The reference wires per-route fanout exchanges, delay queues with
per-message TTL + dead-letter-exchange hops, instant queues and a
dead set (messaging/producer.clj:25-51, 302-378; ~75 LoC of queue
DDL). All of that collapses to TWO append-only tables plus column
math:

    retry(route, channel, <envelope cols>, attempt, max_attempts,
          next_attempt_at, enqueued_at)
    dead_set(route, channel, <envelope cols>, attempts_exhausted,
             poison, died_at)

- "publish to delay queue with TTL" (producer.clj:250-254) =
  append with ``next_attempt_at = enqueued_at + backoff(attempt)``.
- "delay queue dead-letters into instant queue" = the pump filters
  ``next_attempt_at <= now``.
- retry state machine (producer.clj:288-293): attempt counts DOWN;
  NULL attempt = first failure → start at max_attempts - 1 remaining
  after this hop; 0 remaining → dead set.

Delivery contract: "not before next_attempt_at", redelivery at the
next pump trigger — same "not before" guarantee as RMQ TTL, with
trigger-granular latency (documented in SURVEY §7.3).

Storage is plain parquet (no Delta in this environment): the queue
directory is swapped atomically via write-temp + rename. At real
scale this becomes a Delta/Iceberg table with MERGE, or a Kafka
retry topic; the column math and pump plan are identical.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ziggurat_spark.envelope import ENVELOPE_COLUMNS, ensure_envelope
from ziggurat_spark.functions.backoff import (
    DEFAULT_QUEUE_TIMEOUT_MS,
    DEFAULT_RETRY_COUNT,
    backoff_ms_expr,
)


@dataclass(frozen=True)
class RetryConfig:
    """Mirror of the reference's :retry / :rabbit-mq config defaults
    (config.clj:40, 45-46; producer.clj:20)."""

    enabled: bool = True
    max_attempts: int = DEFAULT_RETRY_COUNT
    timeout_ms: int = DEFAULT_QUEUE_TIMEOUT_MS
    exponential: bool = False


class RetryFabric:
    """Append-only retry + dead-set tables under a working directory."""

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        self.retry_dir = os.path.join(workdir, "retry")
        self.dead_dir = os.path.join(workdir, "dead_set")
        os.makedirs(workdir, exist_ok=True)

    # -- reads ---------------------------------------------------------

    def _read(self, path: str) -> DataFrame | None:
        if not os.path.isdir(path) or not any(
            f.endswith(".parquet") for f in os.listdir(path)
        ):
            return None
        return self.spark.read.parquet(path)

    def retry_table(self) -> DataFrame | None:
        return self._read(self.retry_dir)

    def dead_set_table(self) -> DataFrame | None:
        return self._read(self.dead_dir)

    # -- writes --------------------------------------------------------

    def _append(self, df: DataFrame, path: str) -> None:
        df.write.mode("append").parquet(path)

    def _replace(self, df: DataFrame | None, path: str) -> None:
        """Replace a queue directory's contents via double-rename.

        Swapping directories can't be fully atomic on a plain
        filesystem; renaming the old dir aside and the new one in
        shrinks the no-directory window to two renames (µs) instead
        of a recursive delete. A concurrent reader can still observe
        "no table" (returns None) or, rarely, lose listed files
        mid-action — plain parquet dirs have no snapshot isolation;
        the production-scale answer is a transactional table format
        (Delta/Iceberg — see SCALE.md §12)."""
        token = uuid.uuid4().hex[:8]
        tmp = f"{path}.tmp-{token}"
        if df is not None:
            df.write.mode("overwrite").parquet(tmp)
        old = f"{path}.old-{token}"
        if os.path.isdir(path):
            os.rename(path, old)
        if df is not None:
            os.rename(tmp, path)
        if os.path.isdir(old):
            shutil.rmtree(old)

    # -- the state machine --------------------------------------------

    def enqueue_retry(
        self,
        failed: DataFrame,
        route: str,
        cfg: RetryConfig,
        channel: str | None = None,
        now: datetime | None = None,
    ) -> None:
        """One hop of R2 (producer.clj:288-293) + R3 backoff timing:
        split the failed rows into retry-again vs dead-set and append
        to the right table. Pure column logic, one pass."""
        now = now or datetime.now(timezone.utc)
        env = ensure_envelope(failed).select(*ENVELOPE_COLUMNS)
        if not cfg.enabled:
            self._append(
                self._as_dead(env, route, channel, now, poison=False), self.dead_dir
            )
            return
        attempt = F.col("attempt")
        # remaining attempts after this failure
        remaining = (
            F.when(attempt.isNull(), F.lit(cfg.max_attempts))
            .otherwise(attempt)
            .cast("int")
            - 1
        )
        env = env.withColumn("_remaining", remaining)
        to_dead = env.filter(F.col("_remaining") < 0).drop("_remaining")
        if to_dead.isEmpty() is False:
            self._append(
                self._as_dead(to_dead, route, channel, now, poison=False),
                self.dead_dir,
            )
        to_retry = env.filter(F.col("_remaining") >= 0)
        # The reference passes the REMAINING count into the formula
        # (producer.clj:204): n = min(25, max) - remaining, so the
        # delay grows as retries are consumed (first hop n=1).
        backoff = backoff_ms_expr(
            F.col("_remaining"),
            retry_count=cfg.max_attempts,
            timeout_ms=cfg.timeout_ms,
            exponential=cfg.exponential,
        )
        retry_rows = (
            to_retry.withColumn("route", F.lit(route))
            .withColumn("channel", F.lit(channel).cast("string"))
            .withColumn("max_attempts", F.lit(cfg.max_attempts))
            .withColumn("enqueued_at", F.lit(now))
            .withColumn(
                "next_attempt_at",
                F.timestamp_add("MILLISECOND", backoff.cast("long"), F.lit(now)),
            )
            .withColumn("attempt", F.col("_remaining"))
            .drop("_remaining")
        )
        if retry_rows.isEmpty() is False:
            self._append(retry_rows, self.retry_dir)

    def enqueue_dead(
        self,
        rows: DataFrame,
        route: str,
        channel: str | None = None,
        poison: bool = False,
        now: datetime | None = None,
    ) -> None:
        """K4 terminal DLQ append; ``poison`` marks deserialization
        failures shunted as-is (messaging/consumer.clj:28-48)."""
        now = now or datetime.now(timezone.utc)
        env = ensure_envelope(rows).select(*ENVELOPE_COLUMNS)
        self._append(self._as_dead(env, route, channel, now, poison), self.dead_dir)

    @staticmethod
    def _as_dead(
        env: DataFrame, route: str, channel: str | None, now: datetime, poison: bool
    ) -> DataFrame:
        return (
            env.withColumn("route", F.lit(route))
            .withColumn("channel", F.lit(channel).cast("string"))
            .withColumn(
                "attempts_exhausted", F.coalesce(F.col("attempt"), F.lit(0))
            )
            .withColumn("poison", F.lit(poison))
            .withColumn("died_at", F.lit(now))
        )

    # -- the pump (S4: instant-queue consumer) -------------------------

    def due(self, route: str, now: datetime | None = None) -> DataFrame | None:
        """Rows whose delay has expired — the delay-queue →
        instant-queue hop (producer.clj:302-316) as a filter."""
        now = now or datetime.now(timezone.utc)
        t = self.retry_table()
        if t is None:
            return None
        return t.filter(
            (F.col("route") == route) & (F.col("next_attempt_at") <= F.lit(now))
        )

    def pump(
        self,
        route: str,
        process,
        now: datetime | None = None,
    ) -> int:
        """Deliver due rows to ``process(DataFrame, channel) -> None``
        and remove them from the queue (atomic dir swap). Returns the
        number of rows delivered. Rows are delivered PER CHANNEL
        (channel-prefixed instant queues, messaging/util.clj:5-13):
        the main route's rows with ``channel=None``, each channel's
        slice with its name — so channel retries reach the channel
        handler again, never the main handler. ``process`` re-runs
        the right handler; its failure handling (metric + continued
        countdown re-enqueue) happens inside the engine, reference-
        style — pump only compensates for UNEXPECTED errors, by
        putting the original rows back verbatim (still due, channel
        and attempt preserved)."""
        now = now or datetime.now(timezone.utc)
        t = self.retry_table()
        if t is None:
            return 0
        due_pred = (F.col("route") == route) & (
            F.col("next_attempt_at") <= F.lit(now)
        )
        due_full = t.filter(due_pred)
        n = due_full.count()
        if n == 0:
            return 0
        keep = t.filter(~due_pred)
        # Materialize both sides BEFORE swapping the directory they're
        # read from, then swap FIRST and deliver after: the handler
        # may itself re-enqueue retries into this directory, which a
        # later swap would wipe. A hard crash between swap and
        # delivery can lose the in-flight batch — the parquet-queue
        # tradeoff; production backends (Delta MERGE / a Kafka retry
        # topic) close that window.
        due_full = due_full.persist()
        due_full.count()
        keep = keep.persist()
        keep.count()
        try:
            self._replace(keep if keep.isEmpty() is False else None, self.retry_dir)
            channels = [
                r["channel"]
                for r in due_full.select("channel").distinct().collect()
            ]
            for ch in sorted(channels, key=lambda c: (c is not None, c)):
                slice_df = due_full.filter(
                    F.col("channel").eqNullSafe(F.lit(ch))
                ).select(*ENVELOPE_COLUMNS)
                try:
                    process(slice_df, ch)
                except Exception:
                    # compensate: the original rows go back verbatim
                    # (they are still due; channel/attempt preserved)
                    self._append(
                        due_full.filter(
                            F.col("channel").eqNullSafe(F.lit(ch))
                        ),
                        self.retry_dir,
                    )
                    raise
        finally:
            due_full.unpersist()
            keep.unpersist()
        return n

    # -- dead-set ops (R7: view / replay / delete) ----------------------

    def dead_set_view(self, route: str, n: int) -> DataFrame:
        """Peek up to n dead messages (resource/dead_set.clj:46-63)."""
        t = self.dead_set_table()
        if t is None:
            return self.spark.createDataFrame([], schema="route string")
        return (
            t.filter(F.col("route") == route)
            .orderBy(F.col("died_at").desc(), F.col("offset"))
            .limit(n)
        )

    def dead_set_replay(self, route: str, n: int, process) -> int:
        """Move up to n dead messages back through the handler
        (dead_set.clj:6-16): deliver, then drop from the dead set."""
        t = self.dead_set_table()
        if t is None:
            return 0
        route_rows = t.filter(F.col("route") == route).orderBy(
            F.col("died_at").desc(), F.col("offset")
        )
        chosen = route_rows.limit(n).persist()
        k = chosen.count()
        if k == 0:
            chosen.unpersist()
            return 0
        # reset the in-message counter like the reference does on DLQ
        replay_env = chosen.select(*ENVELOPE_COLUMNS).withColumn(
            "attempt", F.lit(None).cast("int")
        )
        remainder = t.exceptAll(chosen).persist()
        remainder.count()
        replay_env = replay_env.persist()
        replay_env.count()
        try:
            # Swap FIRST, deliver after (same ordering as pump()): the
            # handler may dead-letter replayed rows straight back into
            # this directory, and a later swap would wipe them.
            self._replace(
                remainder if remainder.isEmpty() is False else None, self.dead_dir
            )
            process(replay_env)
        finally:
            chosen.unpersist()
            remainder.unpersist()
            replay_env.unpersist()
        return k

    def dead_set_delete(self, route: str, n: int) -> int:
        """Drop up to n dead messages (dead_set.clj:24-28)."""
        t = self.dead_set_table()
        if t is None:
            return 0
        chosen = (
            t.filter(F.col("route") == route)
            .orderBy(F.col("died_at").desc(), F.col("offset"))
            .limit(n)
            .persist()
        )
        k = chosen.count()
        if k == 0:
            chosen.unpersist()
            return 0
        remainder = t.exceptAll(chosen).persist()
        remainder.count()
        self._replace(
            remainder if remainder.isEmpty() is False else None, self.dead_dir
        )
        chosen.unpersist()
        remainder.unpersist()
        return k

"""Observability: ziggurat-parity metric namespaces + streaming listener.

The reference reports every metric under TWO namespaces — the fully
qualified `<service>.<topic-entity>.<ns>` and the bare `<ns>`
(multi-ns-increment-count, metrics.clj:113-115, dot-joined by
intercalate-dot metrics.clj:52-72). Names in play:

- `message.read` counter per consumed record (streams.clj:45-54)
- `message-processing.{success,retry,skip,dead-letter,failure}`
  outcome counters (mapper.clj:28-69)
- `message-received-delay-histogram` — consume lag in ms
  (streams.clj:85-88 + kafka_delay.clj:5-13)
- `stream-joins-message.read` / `stream-joins-...-delay-histogram`
  for join sources (streams.clj:56-65, 90-93)

Spark-first: batch-path tallies come free from the one
`groupBy("outcome")` pass the engine already does (no per-record
instrumentation — counters increment by N per micro-batch);
streaming-path input/progress numbers come from a
StreamingQueryListener. Histograms keep a bounded summary
(count/sum/min/max), not raw samples — driver memory stays O(1) per
metric name at any scale.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

MESSAGE_PROCESSING = "message-processing"
MESSAGE_READ_NS = "message"
DELAY_NS = "message-received-delay-histogram"


@dataclass
class HistogramSummary:
    count: int = 0
    total: float = 0.0
    min: float = float("inf")
    max: float = float("-inf")

    def add(self, value: float, n: int = 1) -> None:
        self.count += n
        self.total += value * n
        self.min = min(self.min, value)
        self.max = max(self.max, value)

    @property
    def mean(self) -> float:
        return self.total / self.count if self.count else 0.0


@dataclass
class MetricsRegistry:
    """In-process metric store with the reference's dual-namespace
    reporting convention. Thread-safe: foreachBatch callbacks and the
    listener run on different threads."""

    service_name: str = "ziggurat-spark"
    counters: dict[str, int] = field(default_factory=dict)
    histograms: dict[str, HistogramSummary] = field(default_factory=dict)
    #: push-style backends (StatsD today; the seam the reference's
    #: metrics_interface.clj protocol provides) — each gets every
    #: counter delta / timing sample as it happens, alongside the
    #: in-process store the Prometheus endpoint scrapes
    exporters: list = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def _names(self, topic_entity: str, ns: str, metric: str | None) -> list[str]:
        suffix = f".{metric}" if metric else ""
        return [
            f"{self.service_name}.{topic_entity}.{ns}{suffix}",
            f"{ns}{suffix}",
        ]

    def inc(self, topic_entity: str, ns: str, metric: str, n: int = 1) -> None:
        """multi-ns-increment-count (metrics.clj:113-115)."""
        if n == 0:
            return
        with self._lock:
            for name in self._names(topic_entity, ns, metric):
                self.counters[name] = self.counters.get(name, 0) + n
        for exp in self.exporters:
            exp.update_counter(topic_entity, ns, metric, n)

    def report_histogram(
        self, topic_entity: str, ns: str, value: float, n: int = 1
    ) -> None:
        """multi-ns-report-histogram (kafka_delay.clj:5-13)."""
        if n == 0:
            return
        with self._lock:
            for name in self._names(topic_entity, ns, None):
                self.histograms.setdefault(name, HistogramSummary()).add(value, n)
        for exp in self.exporters:
            exp.update_timing(topic_entity, ns, value, n)

    def counter(self, name: str) -> int:
        return self.counters.get(name, 0)

    def snapshot(self) -> dict[str, float]:
        with self._lock:
            out: dict[str, float] = dict(self.counters)
            for name, h in self.histograms.items():
                out[f"{name}.count"] = h.count
                out[f"{name}.mean"] = h.mean
            return out

    def prometheus_text(self) -> str:
        """Prometheus text exposition (v0.0.4) of the registry — the
        engine's spelling of the reference's standalone metrics server
        (prometheus_exporter.clj:34-48). Parity details: counters are
        exposed as gauges (update-counter registers prometheus/gauge,
        prometheus_exporter.clj:20-25); histograms expose _count and
        _sum like a prometheus histogram (report-histogram :26-31)
        plus bounded _min/_max gauges (the summary this registry
        keeps). Dots/dashes in ziggurat namespaces sanitize to
        underscores per the exposition grammar."""
        with self._lock:
            lines: list[str] = []
            for name in sorted(self.counters):
                pname = _prom_name(name)
                lines.append(f"# TYPE {pname} gauge")
                lines.append(f"{pname} {self.counters[name]}")
            for name in sorted(self.histograms):
                h = self.histograms[name]
                pname = _prom_name(name)
                lines.append(f"# TYPE {pname} summary")
                lines.append(f"{pname}_count {h.count}")
                lines.append(f"{pname}_sum {_prom_float(h.total)}")
                lines.append(f"{pname}_min {_prom_float(h.min)}")
                lines.append(f"{pname}_max {_prom_float(h.max)}")
            return "\n".join(lines) + "\n"


def _prom_name(name: str) -> str:
    """Sanitize to the exposition grammar [a-zA-Z_:][a-zA-Z0-9_:]*."""
    import re

    out = re.sub(r"[^a-zA-Z0-9_:]", "_", name)
    if out and out[0].isdigit():
        out = "_" + out
    return out


def _prom_float(v: float) -> str:
    if v == float("inf"):
        return "+Inf"
    if v == float("-inf"):
        return "-Inf"
    return repr(v) if isinstance(v, float) else str(v)


class ZigguratQueryListener(StreamingQueryListener):
    """Streaming-side taps: per-query input rows, processing rate and
    batch duration — the Spark spelling of the reference's reporter
    state (metrics.clj:40-50). Attach with `attach()`; one listener
    serves every route on the session."""

    def __init__(self, registry: MetricsRegistry):
        self.registry = registry
        self._spark: SparkSession | None = None
        # last batchId per query id — batches are monotone per query,
        # so one int per query dedupes re-emitted progress without
        # the unbounded (query, batch) set a long-running route
        # would leak
        self._last_batch: dict[str, int] = {}

    def attach(self, spark: SparkSession) -> "ZigguratQueryListener":
        spark.streams.addListener(self)
        self._spark = spark
        return self

    def detach(self) -> None:
        if self._spark is not None:
            self._spark.streams.removeListener(self)
            self._spark = None

    # -- StreamingQueryListener interface ---------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        # Spark re-emits the last batch's progress (e.g. on idle/stop);
        # count each (query, batch) once. batchIds are monotone per
        # query, so the last one seen is a complete dedup record.
        qid, bid = str(p.id), int(p.batchId)
        if self._last_batch.get(qid, -1) >= bid:
            return
        self._last_batch[qid] = bid
        route = p.name or p.id
        self.registry.inc(route, "streaming-query", "batches", 1)
        self.registry.inc(
            route, "streaming-query", "input-rows", int(p.numInputRows or 0)
        )
        duration = (p.durationMs or {}).get("triggerExecution")
        if duration is not None:
            self.registry.report_histogram(
                route, "streaming-query.trigger-duration-ms", float(duration)
            )
        # df.observe taps on streaming queries surface here (T10's
        # streaming half): integer observation columns accumulate as
        # counters under observed.<tap>.<column>, doubles as
        # histograms — the same pass-riding metrics the reference's
        # mapValues taps emit (streams.clj:45-64).
        for tap, row in (getattr(p, "observedMetrics", None) or {}).items():
            for col, val in row.asDict().items():
                if val is None:
                    continue
                if isinstance(val, bool):
                    continue
                if isinstance(val, int):
                    self.registry.inc(
                        route, f"observed.{tap}", col, int(val)
                    )
                elif isinstance(val, float):
                    self.registry.report_histogram(
                        route, f"observed.{tap}.{col}", val
                    )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


class StatsdExporter:
    """StatsD line-protocol backend — parity with the reference's
    clj-statsd wrapper (clj_statsd_metrics_wrapper.clj:29-37 over
    metrics_interface.clj): counters emit ``<ns>.<metric>:<n>|c|@1.0``
    and timings ``<ns>:<ms>|ms|@1.0``, DogStatsD ``|#tag:val`` tags
    appended. The dual-namespace convention (metrics.clj:113-115 /
    get-metric-namespaces :64-72) emits each sample under BOTH the
    bare namespace (tagged with actor/env/topic_entity) and the
    ``<service>.<topic-entity>.<ns>`` form (actor/env only — the
    topic is already in the name, remove-topic-tag-for-old-namespace
    metrics.clj:57-60). Fire-and-forget UDP: a dead statsd daemon
    never blocks or fails the data path."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 8125,
        service_name: str = "ziggurat-spark",
        env: str = "dev",
        rate: float = 1.0,
    ):
        import socket

        self._addr = (host, port)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.service_name = service_name
        self.env = env
        self.rate = rate

    # -- MetricsProtocol (metrics_interface.clj) ------------------------

    def update_counter(
        self, topic_entity: str, ns: str, metric: str, value: int
    ) -> None:
        if not self._sampled():
            return
        rate = self._fmt_rate(self.rate)
        for name, tags in self._variants(topic_entity, ns, metric):
            self._send(f"{name}:{value}|c|@{rate}{tags}")

    #: largest multiplicity a single @rate stamp can carry exactly:
    #: _fmt_rate floors at 1e-8, so one datagram can encode at most
    #: rate·1e8 samples before the server-side 1/rate scale-up
    #: under-reports. update_timing splits above this bound.
    _RATE_FLOOR_INV = 10**8

    def update_timing(
        self, topic_entity: str, ns: str, value: float, n: int = 1
    ) -> None:
        # ONE datagram per namespace variant regardless of sample
        # multiplicity: statsd servers scale sample counts by
        # 1/sample-rate, so @{rate/n} encodes "this value occurred n
        # times" without n sendto() calls on the listener thread (a
        # hot micro-batch can carry tens of thousands of samples).
        # Above rate·1e8 samples the 1e-8 rate floor would clamp the
        # stamp, so the multiplicity is SPLIT across ceil(n/cap)
        # datagrams, each within the exactly-representable range
        # (residual bias: @rate truncates — not rounds — at 8
        # decimals, ≤ 1 part in 1e8 of the reported count).
        if n <= 0 or not self._sampled():
            return
        cap = max(1, int(self.rate * self._RATE_FLOOR_INV))
        chunks = [cap] * (n // cap)
        if n % cap:
            chunks.append(n % cap)
        for name, tags in self._variants(topic_entity, ns, None):
            for chunk in chunks:
                rate = self._fmt_rate(self.rate / chunk)
                self._send(
                    f"{name}:{_statsd_num(value)}|ms|@{rate}{tags}"
                )

    def terminate(self) -> None:
        self._sock.close()

    # -- internals ------------------------------------------------------

    def _sampled(self) -> bool:
        """Honest client-side sampling: with ``rate`` < 1.0 only that
        fraction of update calls emit packets — the ``@rate`` stamp
        then makes the server's 1/rate scale-up correct instead of an
        over-count."""
        if self.rate >= 1.0:
            return True
        import random

        return random.random() < self.rate

    @staticmethod
    def _fmt_rate(rate: float) -> str:
        # canonical "@1.0" for the unsampled case (clj-statsd parity);
        # fixed-point otherwise — %g would emit exponent notation
        # ("1e-05") below 1e-4, which not every statsd parser accepts.
        # Floor at 1e-8 so extreme multiplicities still produce a
        # non-zero, parseable rate.
        if rate >= 1.0:
            return "1.0"
        s = f"{max(rate, 1e-8):.8f}".rstrip("0")
        return s + "0" if s.endswith(".") else s

    def _variants(self, topic_entity: str, ns: str, metric: str | None):
        suffix = f".{metric}" if metric else ""
        base_tags = f"|#actor:{self.service_name},env:{self.env}"
        return [
            (
                f"{self.service_name}.{topic_entity}.{ns}{suffix}",
                base_tags,
            ),
            (
                f"{ns}{suffix}",
                f"{base_tags},topic_entity:{topic_entity}",
            ),
        ]

    def _send(self, line: str) -> None:
        try:
            self._sock.sendto(line.encode("utf-8"), self._addr)
        except OSError:
            pass  # observability must never fail the data path


def _statsd_num(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(float(v))

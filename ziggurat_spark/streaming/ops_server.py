"""HTTP ops server — ping + dead-set view/replay/delete.

Endpoint parity with the reference's Jetty server (server.clj:28-48;
routes server/routes.clj:18-23; handlers resource/dead_set.clj:40-94):

    GET    /ping                    → 200 "pong"
    GET    /metrics                 → Prometheus text exposition of the
                                      engine registry (the reference's
                                      standalone exporter server,
                                      prometheus_exporter.clj:34-48)
    GET    /v1/dead_set?count=N&topic-entity=R[&channel=C]  → messages
    POST   /v1/dead_set/replay?...  → triggers replay (async, like the
                                      reference's `future`)
    DELETE /v1/dead_set?...         → triggers delete (async)

Validation parity: count must be a positive integer (parse-count /
validate-count, dead_set.clj:17-30), the topic-entity must name a
registered route, and a disabled retry fabric answers 404
(retry-allowed? → not-found-for-retry).

Implementation: stdlib ThreadingHTTPServer — the ops plane is a
driver-side convenience, never on the data path, so no web framework
is warranted. Replay/delete run on a worker thread (parity with the
reference's `future`) and serialize through a lock because they
rewrite the dead-set directory.
"""

from __future__ import annotations

import json
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from ziggurat_spark.streaming.engine import ZigguratEngine


class OpsServer:
    """Lifecycle wrapper: serve_forever on a daemon thread."""

    def __init__(self, engine: ZigguratEngine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self._ds_lock = threading.Lock()
        handler = _make_handler(self)
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "OpsServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True, name="zs-ops-server"
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    # -- dead-set operations (run under the lock) -----------------------

    def view(self, route: str, n: int, channel: str | None = None) -> list[dict]:
        # under the lock like replay/delete: those swap the dead-set
        # directory, and a concurrent swap mid-collect would fail the
        # scan on vanished part files
        with self._ds_lock:
            rows = self.engine.fabric.dead_set_view(route, n, channel).collect()
        return [
            {k: _jsonable(v) for k, v in r.asDict().items()} for r in rows
        ]

    def replay(self, route: str, n: int, channel: str | None = None) -> None:
        """Replay: route-level rows re-enter through the MAIN handler
        (publish-to-instant-queue, dead_set.clj:11-13); channel rows
        re-enter through THAT CHANNEL's handler (publish-to-channel-
        instant-queue, dead_set.clj:15-16 → the same dispatch the
        retry pump uses, engine.pump_retries)."""
        if channel is None:
            def process(env):
                self.engine.process_batch(
                    self.engine.routes[route],
                    env,
                    batch_id=-3,
                    now=datetime.now(timezone.utc),
                )
        else:
            def process(env):
                self.engine._deliver_channel(
                    self.engine.routes[route],
                    channel,
                    env,
                    datetime.now(timezone.utc),
                )
        with self._ds_lock:
            self.engine.fabric.dead_set_replay(route, n, process, channel)

    def delete(self, route: str, n: int, channel: str | None = None) -> None:
        with self._ds_lock:
            self.engine.fabric.dead_set_delete(route, n, channel)


def _jsonable(v):
    if isinstance(v, (bytes, bytearray)):
        return v.decode("utf-8", errors="replace")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _make_handler(ops: OpsServer):
    #: bounded label set for the request counter (arbitrary URIs would
    #: leak unbounded metric names)
    KNOWN_PATHS = {"/ping", "/metrics", "/v1/dead_set", "/v1/dead_set/replay"}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *_a) -> None:  # quiet
            pass

        def _send(self, status: int, body, content_type="application/json"):
            self._response_started = True
            # wrap-default-content-type-json parity (server/middleware
            # .clj:15-21): JSON unless the handler says otherwise
            # wrap-with-metrics parity (middleware.clj:38-44):
            # requests-served counter tagged by (bounded) uri + status.
            # Counted BEFORE the body flushes: the client unblocks the
            # moment the response lands, and the metric must already
            # be visible then.
            path = urlparse(self.path).path
            label = path if path in KNOWN_PATHS else "other"
            ops.engine.metrics.inc(
                "ops", f"http-server.requests-served.{label}", str(status)
            )
            data = (
                body.encode()
                if isinstance(body, str)
                else json.dumps(body).encode()
            )
            self.send_response(status)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def handle_one_request(self) -> None:
            # wrap-errors parity (middleware.clj:29-36): an uncaught
            # handler exception answers 500 with an error body instead
            # of dropping the connection — but ONLY when no response
            # has started: writing a second status line into a stream
            # that already carries headers/body corrupts the response
            # and double-counts the request metric. If headers are
            # out, just let the connection close.
            self._response_started = False
            try:
                super().handle_one_request()
            except Exception as exc:  # noqa: BLE001
                if self._response_started:
                    self.close_connection = True
                    return
                try:
                    self._send(500, {"Error": repr(exc)})
                except Exception:  # noqa: BLE001 — socket already gone
                    pass

        def _dead_set_params(self):
            """Shared validation (resource/dead_set.clj:17-44):
            positive count, registered route, optional ``channel``
            that must be declared ON that route, and retry enabled —
            for channel requests the CHANNEL's retry config decides
            (retry-allowed? → channel-retry-enabled?,
            dead_set.clj:29-39), not the route-level one."""
            q = parse_qs(urlparse(self.path).query)
            route = (q.get("topic-entity") or [None])[0]
            channel = (q.get("channel") or [None])[0]
            raw = (q.get("count") or [""])[0]
            try:
                n = int(raw)
                if n <= 0:
                    raise ValueError
            except ValueError:
                self._send(400, {"error": "Count should be positive integer"})
                return None
            bad_route = route is None or route not in ops.engine.routes
            if bad_route or (
                channel is not None
                and channel not in ops.engine.routes[route].channels
            ):
                self._send(
                    400,
                    {
                        "error": (
                            "Topic entity/channel should be provided and "
                            "must be present in stream routes"
                        )
                    },
                )
                return None
            r = ops.engine.routes[route]
            cfg = r.retry if channel is None else r.channel_retry.get(
                channel, r.retry
            )
            if not cfg.enabled:
                self._send(404, {"error": "Retry is not enabled"})
                return None
            return route, n, channel

        def do_GET(self) -> None:  # noqa: N802 (http.server API)
            path = urlparse(self.path).path
            if path == "/ping":
                self._send(200, "pong", content_type="text/plain")
                return
            if path == "/metrics":
                # Prometheus scrape endpoint (prometheus_exporter.clj:
                # 34-48 standalone server, collapsed onto the ops port)
                self._send(
                    200,
                    ops.engine.metrics.prometheus_text(),
                    content_type="text/plain; version=0.0.4",
                )
                return
            if path == "/v1/dead_set":
                params = self._dead_set_params()
                if params:
                    route, n, channel = params
                    self._send(
                        200, {"messages": ops.view(route, n, channel)}
                    )
                return
            self._send(404, "")

        def do_POST(self) -> None:  # noqa: N802
            if urlparse(self.path).path == "/v1/dead_set/replay":
                params = self._dead_set_params()
                if params:
                    route, n, channel = params
                    threading.Thread(
                        target=ops.replay, args=(route, n, channel), daemon=True
                    ).start()
                    self._send(
                        200,
                        {
                            "message": (
                                "Replay has been triggered. "
                                "Please check after some time"
                            )
                        },
                    )
                return
            self._send(404, "")

        def do_DELETE(self) -> None:  # noqa: N802
            if urlparse(self.path).path == "/v1/dead_set":
                params = self._dead_set_params()
                if params:
                    route, n, channel = params
                    threading.Thread(
                        target=ops.delete, args=(route, n, channel), daemon=True
                    ).start()
                    self._send(
                        200,
                        {
                            "message": (
                                "Delete has been triggered. "
                                "Please check after some time"
                            )
                        },
                    )
                return
            self._send(404, "")

    return Handler

"""Application entry — parity with `src/ziggurat/init.clj` `main`.

The reference's lifecycle (`init.clj:244-273`): take `{:start-fn
:stop-fn :stream-routes :actor-routes :modes}`, derive modes
(`init.clj:226-242`), validate route shapes + routes-vs-config
(`init.clj:185-224`), load config, start states in order, run, stop
in reverse. Here the same contract lands on Spark:

- a *route spec* is ``{"handler-fn": handler, "<channel>":
  channel_handler, ...}`` exactly like the reference's route maps
  (`init.clj:187-200` StreamRoute schema);
- mode derivation keeps the reference's rule: no routes at all is an
  error; stream routes imply the stream worker, batch routes the
  batch worker;
- per-route retry/staleness settings come from the layered config
  (``config.py``), not from code — the reference's "config decides,
  code registers handlers" split;
- start/stop map onto ZigguratEngine.start_route / stop_all (R9/R10
  drain semantics live there).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ziggurat_spark.config import (
    alpha_feature_enabled,
    get_in_config,
    load_config,
    retry_config_from,
    validate_routes_against_config,
)
from ziggurat_spark.streaming.engine import (
    DEFAULT_OLDEST_PROCESSED_S,
    Route,
    ZigguratEngine,
)

Handler = Callable[[DataFrame], DataFrame]


def derive_modes(
    stream_routes: Mapping[str, Any] | None,
    batch_routes: Mapping[str, Any] | None,
) -> list[str]:
    """`init.clj:226-242`: at least one route family must be present;
    workers are derived from which families are."""
    if not stream_routes and not batch_routes:
        raise ValueError(
            "Either stream_routes or batch_routes should be present in "
            "init args"
        )
    modes = ["management-api", "worker"]
    if stream_routes:
        modes.append("stream-worker")
    if batch_routes:
        modes.append("batch-worker")
    return modes


def validate_route_shape(routes: Mapping[str, Mapping[str, Any]]) -> None:
    """`init.clj:185-200` StreamRoute schema: every route map needs a
    callable handler-fn; channel values must be callable too."""
    for name, spec in routes.items():
        if not isinstance(spec, Mapping) or "handler-fn" not in spec:
            raise ValueError(f"route {name}: missing handler-fn")
        for key, fn in spec.items():
            if not callable(fn):
                raise ValueError(f"route {name}: {key} is not callable")


def build_routes(
    config: Mapping[str, Any],
    stream_routes: Mapping[str, Mapping[str, Any]],
    sources: Mapping[str, Callable[[], DataFrame]],
    route_type: str = "stream-router",
) -> list[Route]:
    """Route maps + config → engine Routes. Retry policy and the
    staleness horizon are config-driven per route (the route_type
    section: stream-router / batch-routes), mirroring how
    `streams.clj:22-32` deep-merges per-route config over defaults."""
    routes = []
    for name, spec in stream_routes.items():
        # streams.clj:163-170: a stream-joins route builds a topology
        # only when the :alpha-features :stream-joins flag is set —
        # otherwise it's skipped with a warning, not an error.
        if get_in_config(
            config, [route_type, name, "consumer-type"]
        ) == "stream-joins" and not alpha_feature_enabled(
            config, "stream-joins"
        ):
            import warnings

            warnings.warn(
                f"route {name}: stream-joins is an alpha feature; "
                "enable [alpha-features stream-joins] in config",
                stacklevel=2,
            )
            continue
        channels = {k: v for k, v in spec.items() if k != "handler-fn"}
        oldest = get_in_config(
            config,
            [route_type, name, "oldest-processed-message-in-s"],
            get_in_config(
                config,
                ["streams", "oldest-processed-message-in-s"],
                DEFAULT_OLDEST_PROCESSED_S,
            ),
        )
        routes.append(
            Route(
                name=name,
                source=sources[name],
                handler=spec["handler-fn"],
                channels=channels,
                retry=retry_config_from(config, name, None),
                channel_retry={
                    ch: retry_config_from(config, name, ch)
                    for ch in channels
                },
                oldest_processed_s=int(oldest),
            )
        )
    return routes


class ZigguratApp:
    """`init.clj` main/start/stop as an object: construct with route
    maps, call start() to validate + register + run, stop() to drain.
    """

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        sources: Mapping[str, Callable[[], DataFrame]],
        stream_routes: Mapping[str, Mapping[str, Any]] | None = None,
        batch_routes: Mapping[str, Mapping[str, Any]] | None = None,
        config_path: str | None = None,
        start_fn: Callable[[], None] | None = None,
        stop_fn: Callable[[], None] | None = None,
    ):
        self.modes = derive_modes(stream_routes, batch_routes)
        self.stream_routes = dict(stream_routes or {})
        self.batch_routes = dict(batch_routes or {})
        self.config = load_config(config_path)
        self.start_fn = start_fn
        self.stop_fn = stop_fn
        if "stream-worker" in self.modes:
            validate_route_shape(self.stream_routes)
            validate_routes_against_config(
                self.config, self.stream_routes, "stream-router"
            )
        if "batch-worker" in self.modes:
            validate_route_shape(self.batch_routes)
            validate_routes_against_config(
                self.config, self.batch_routes, "batch-routes"
            )
        self.engine = ZigguratEngine(spark, workdir)
        for route in build_routes(
            self.config, self.stream_routes, sources, "stream-router"
        ):
            self.engine.register_route(route)
        for route in build_routes(
            self.config, self.batch_routes, sources, "batch-routes"
        ):
            self.engine.register_route(route)

    def start(self) -> None:
        """`init.clj:244-273` start order: user start-fn first, then
        the workers — stream routes as streaming queries (checkpoints
        under the engine workdir, R6), batch routes as one bounded
        poll cycle each (S3; drive engine.run_batch_route again for a
        poll loop)."""
        if self.start_fn:
            self.start_fn()
        for name in self.engine.routes:
            if name in self.batch_routes:
                self.engine.run_batch_route(name)
            else:
                self.engine.start_route(name)

    def stop(self) -> None:
        """Reverse order: drain workers (R9), then user stop-fn."""
        self.engine.stop_all(drain=True)
        if self.stop_fn:
            self.stop_fn()

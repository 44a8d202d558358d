"""Registry of the engine's declared, oracle-checkable query surface.

Each entry pairs a Spark DataFrame builder with the equivalent ANSI
SQL that DuckDB runs over the same parquet tables (SURVEY.md §2.2).
The driver hash-compares results; ``oracle=None`` marks genuinely
non-SQL-expressible ops (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules lazily so `import ziggurat_spark`
    # stays cheap and circular imports are impossible.
    from ziggurat_spark.queries import (  # noqa: F401
        aggs,
        analytics,
        behavior,
        corpus_ops,
        dedup,
        entity_res,
        envelope,
        functions_more,
        functions_surface,
        graph_seq,
        joins,
        market,
        ml_cluster,
        ngrams,
        pricing,
        protobuf_surface,
        quality_audit,
        routing,
        semistructured,
        setops,
        sources_surface,
        similarity,
        statistics,
        statistics_more,
        stats_lateral,
        skew_surface,
        streaming_surface,
        text,
        timeseries,
        training_ops,
        tpch_more,
        tpch_sub,
        urls_formats,
        windows,
    )

    return dict(_REGISTRY)

"""Physical-plan quality inspection — the scale checklist as code.

The reference has no optimizer to inspect (SURVEY §4.1: topologies
execute as written); on Spark the plan IS the performance contract,
so the engine ships these helpers and tests pin the properties that
matter at 100 TB:

- filters reach the parquet scan (PushedFilters),
- projections prune the scan (ReadSchema),
- small dimensions broadcast instead of shuffling,
- no accidental cartesian products,
- shuffle counts match the minimum the query semantics require.

Parsing the `formatted` explain output is deliberate: it's the same
surface a human reviews, so a test failure prints exactly what an
engineer would look at.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The EXPLAIN FORMATTED text (physical plan + node details)."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every predicate that reached a file scan, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each file scan — what actually gets read."""
    return [
        m.group(1)
        for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))
    ]


def shuffle_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes (broadcast exchanges and
    AQE-reused exchanges excluded). Formatted explain puts the node
    name and its partitioning arguments on separate lines, so count
    the node-detail headers: ``(n) Exchange``."""
    return len(re.findall(r"^\(\d+\) Exchange\b", formatted_plan(df), re.M))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", formatted_plan(df)))


def has_cartesian_product(df: DataFrame) -> bool:
    return "CartesianProduct" in formatted_plan(df)

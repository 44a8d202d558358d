"""Declared query surface (SURVEY.md §2.2): Z01–Z28 + extensions."""

from ziggurat_spark.queries.registry import QuerySpec, all_queries, register

__all__ = ["QuerySpec", "all_queries", "register"]

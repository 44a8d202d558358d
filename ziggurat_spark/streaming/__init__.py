"""Structured-Streaming fabric: routes, retry pump, lifecycle, metrics."""

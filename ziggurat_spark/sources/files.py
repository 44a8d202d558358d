"""File-based streaming source — the test/replay stand-in for Kafka.

The reference's tests produce records synchronously to an embedded
broker (streams_test.clj IntegrationTestUtils); our harness replays
parquet/json files through the identical route dataflow instead
(SURVEY §5.2). Also the production story for backfills: replay a
captured envelope table through the same route.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def file_stream_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming reader over a directory of files; schema defaults to
    whatever a batch read of the path infers (file sources require an
    explicit schema when streaming)."""
    if schema is None:
        schema = spark.read.format(fmt).load(path).schema
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)

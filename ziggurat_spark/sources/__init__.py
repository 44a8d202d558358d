from ziggurat_spark.sources.kafka import (  # noqa: F401
    kafka_batch_source,
    kafka_sink_writer,
    kafka_stream_source,
    kafka_stream_sources,
)
from ziggurat_spark.sources.files import file_stream_source  # noqa: F401

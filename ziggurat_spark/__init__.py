"""ziggurat_spark — a PySpark-native stream/dataflow engine.

A ground-up re-expression of the capabilities of gojek/ziggurat
(a Clojure Kafka-streams framework; see SURVEY.md) as idiomatic
PySpark: DataFrame/Catalyst for all relational work, Structured
Streaming for the dataflow fabric (routes, outcome routing, retry
queues, dead-set), plus large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing).

Nothing here is copied from the reference; reference citations in
docstrings (``path:line`` under /root/reference) exist so behavior
parity can be audited.
"""

from ziggurat_spark.session import get_session
from ziggurat_spark.tables import TABLES, load_table, register_views

__all__ = ["get_session", "TABLES", "load_table", "register_views"]

__version__ = "0.1.0"

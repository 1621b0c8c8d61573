"""kafkastreamsproject_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference stream processor (pientaa/KafkaStreamsProject,
a Kotlin Kafka Streams app; see /root/reference), extended with the
data-pipeline operators a large-scale training-data system needs
(dedup, similarity search, text analysis, multimodal columns).

Design stance (SURVEY.md §7): a thin, typed PySpark library — schema
registry + operator/query modules + streaming pipelines.  Catalyst is the
optimizer; Structured Streaming is the runtime; this code declares
semantics with the DataFrame/SQL API and only drops to Pandas UDFs where
built-ins genuinely cannot express the operator.
"""

__version__ = "0.1.0"

from kafkastreamsproject_spark.session import get_spark  # noqa: F401

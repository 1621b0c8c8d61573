"""Streaming sources — the reference's ingestion surface, Spark-first.

Reference mapping (SURVEY.md §2.1):
- S1–S3 directory CSV replay (producer/KafkaProducer.kt:37-57) → Spark
  file-stream source over the same CSVs; Spark lists files in
  lexicographic order, matching the reference's sorted walk.
- S5 throttling (1 rec/s Thread.sleep) → ``maxFilesPerTrigger`` pacing:
  rate control belongs to the source, not a per-row sleep.
- S6 Kafka topic (consumer/KafkaConsumer.kt:40-41) → ``readStream
  .format("kafka")`` + ``from_json``; JSON only at the boundary
  (the reference JSON-serializes at EVERY operator boundary — §1.2).

The Kafka connector jar is not shipped in this environment, so the
Kafka builders raise a clear error at use; everything downstream
consumes a typed DataFrame and does not care which source produced it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamsproject_spark.schemas import TRIP, TRIP_TS_FORMAT


def trip_file_stream(
    spark: SparkSession,
    directory: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replay a directory of trip CSVs as a stream (S1–S3, S5).

    Files are headerless CSV in the reference's column order; the
    reference's ``yyyy-MM-dd'T'HH:mm:ss.SSS'Z'`` timestamps are parsed
    by the CSV reader via ``timestampFormat``.
    """
    reader = (
        spark.readStream.schema(TRIP)
        .option("timestampFormat", TRIP_TS_FORMAT)
        .option("header", "false")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.csv(directory)


def kafka_trip_stream(
    spark: SparkSession,
    brokers: str = "localhost:9092",
    topic: str = "input-topic",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S6: Kafka source → typed Trip columns via one boundary from_json.

    ``startingOffsets=earliest`` reproduces the reference's
    cleanUp()-then-start behavior (T6): every run reprocesses the topic.
    Requires the spark-sql-kafka connector jar on the classpath.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), TRIP).alias("trip")
    ).select("trip.*")


def kafka_available(spark: SparkSession) -> bool:
    """True when the Kafka connector classes are on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False

"""Batch CSV readers for the reference's file formats (S1–S3, S7).

The reference parses CSVs positionally with hard-coded indices and
skips headers by substring match (producer/KafkaProducer.kt:49-57,
consumer/KafkaConsumer.kt:87-94).  Spark-first: explicit StructTypes
(schemas.py), the CSV reader's header handling, and the reference's
timestamp format — no inference anywhere.  ``mode="FAILFAST"``
reproduces the reference's throw-on-bad-row behavior (its positional
casts would throw); pass ``"DROPMALFORMED"`` for the lenient variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafkastreamsproject_spark.schemas import STATION, TRIP, TRIP_TS_FORMAT


def read_trips_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    mode: str = "FAILFAST",
) -> DataFrame:
    """S1–S3: trip CSVs (directory or file; Spark lists files in
    lexicographic order, matching the reference's sorted walk)."""
    return (
        spark.read.schema(TRIP)
        .option("header", str(header).lower())
        .option("timestampFormat", TRIP_TS_FORMAT)
        .option("mode", mode)
        .csv(path)
    )


def read_stations_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    mode: str = "FAILFAST",
) -> DataFrame:
    """S7: the static station dimension (KafkaConsumer.kt:79-95).
    Callers broadcast it into the enrich join; at any scale a dimension
    of this shape stays executor-resident."""
    return (
        spark.read.schema(STATION)
        .option("header", str(header).lower())
        .option("mode", mode)
        .csv(path)
    )

"""Schema registry — every schema the engine touches, declared explicitly.

The reference declares all schemas in code (Kotlin data classes; positional
CSV parsing at reference producer/KafkaProducer.kt:50-57 and
consumer/KafkaConsumer.kt:88-94) and never infers.  We keep that stance:
explicit ``StructType`` everywhere, ``inferSchema`` never.

Two schema families:

* Reference-domain (Divvy bike-share): ``TRIP``, ``STATION``,
  ``TRIP_STATION`` (the 17-column join output), ``AGGREGATED_INFO``,
  ``ANOMALY_SUMMARY`` — cf. reference model/Trip.kt:6-16,
  model/Station.kt:3-12, model/TripStation.kt:6-43,
  model/AggregatedInfo.kt:6-12,
  model/anomalyDetection/TripStationSummaryInfo.kt:9-25.
* Driver testdata (TPC-H-ish star + events/documents/embeddings), verified
  against the parquet footers under /root/testdata.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Reference-domain schemas
# --------------------------------------------------------------------------

# Trip stream payload. Field order/types follow the reference's positional
# CSV parse (producer/KafkaProducer.kt:50-57). `type` semantics: the
# aggregator counts type==1 as a STARTED trip (CustomTransformer.kt:33-35);
# we replicate the code, not the (contradicting) comment at Trip.kt:8.
TRIP = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("type", T.IntegerType(), False),
        T.StructField("dateTime", T.TimestampType(), False),
        T.StructField("stationId", T.IntegerType(), False),
        T.StructField("duration", T.DoubleType(), True),
        T.StructField("userType", T.StringType(), True),
        T.StructField("gender", T.StringType(), True),
        T.StructField("week", T.IntegerType(), True),
        T.StructField("temperature", T.DoubleType(), True),
        T.StructField("events", T.StringType(), True),
    ]
)

# Timestamp format of the reference's CSV replay (KafkaProducer.kt:28-29).
TRIP_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

# Static station dimension (KafkaConsumer.kt:88-94, model/Station.kt:3-12).
STATION = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("totalDocks", T.LongType(), False),
        T.StructField("docksInService", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("location", T.StringType(), True),
    ]
)

# Join output: 10 trip + 7 station columns with the reference's renames
# (model/TripStation.kt:25-43): dateTime→tripTime, name→stationName,
# station id dropped (the join key survives as trip.stationId),
# totalDocks→stationTotalDocks etc.
TRIP_STATION_COLUMNS = [
    "tripId",
    "tripType",
    "tripTime",
    "stationId",
    "duration",
    "userType",
    "gender",
    "week",
    "temperature",
    "events",
    "stationName",
    "stationTotalDocks",
    "stationDocksInService",
    "stationStatus",
    "stationLatitude",
    "stationLongitude",
    "stationLocation",
]

# Aggregate value per (stationName, eventDay) — model/AggregatedInfo.kt:6-12.
AGGREGATED_INFO = T.StructType(
    [
        T.StructField("stationName", T.StringType(), False),
        T.StructField("eventDay", T.DateType(), False),
        T.StructField("avgTemperature", T.DoubleType(), True),
        T.StructField("startedTrips", T.LongType(), False),
        T.StructField("endedTrips", T.LongType(), False),
        T.StructField("updateTime", T.TimestampType(), True),
    ]
)

# Windowed anomaly summary — TripStationSummaryInfo.kt:9-25.
ANOMALY_SUMMARY = T.StructType(
    [
        T.StructField(
            "window",
            T.StructType(
                [
                    T.StructField("start", T.TimestampType(), True),
                    T.StructField("end", T.TimestampType(), True),
                ]
            ),
            False,
        ),
        T.StructField("stationName", T.StringType(), False),
        T.StructField("returnedOverRented", T.LongType(), False),
        T.StructField("rentedOverReturned", T.LongType(), False),
        T.StructField("totalDocks", T.LongType(), False),
        T.StructField("nToDocksRatio", T.DoubleType(), False),
    ]
)

# --------------------------------------------------------------------------
# Driver testdata schemas (verified against parquet footers)
# --------------------------------------------------------------------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

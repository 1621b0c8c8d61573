"""Faithful stream-time punctuation (T2) + eviction (T4) as a custom
stateful operator.

The reference decouples state mutation from emission: ``transform``
returns null for every record, and a STREAM_TIME punctuator forwards
the entire store every 5 minutes of event time, then evicts every day
older than the newest (consumer/CustomTransformer.kt:45,56-80).

Spark-first adaptation: ``applyInPandasWithState`` over
(stationName, eventDay) with an event-time timeout —

- per-record batches only UPDATE state (emit nothing), like
  ``transform``'s null return;
- when the watermark advances past a key's timeout, the timer fires and
  the key EMITS its aggregate (the punctuator's forward), then either
  re-arms (+interval) or, if the key's day has fallen behind the
  watermark, removes its state — the principled version of T4's
  "keep only the newest day" eviction (late events are dropped by the
  watermark instead of zero-reinitialized, fixing the T7 bug).

The per-key timer fires on watermark (stream-time) advance, matching
PunctuationType.STREAM_TIME cadence per key; the reference's
full-store-scan emission is global, which a distributed state store
deliberately avoids (SURVEY §7 M3.1 documents the divergence).

``transformWithStateInPandas`` (Spark 4) is the successor API with the
same init/handle/timer shape; this uses applyInPandasWithState for
state-store-provider portability.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafkastreamsproject_spark.operators.joins import enrich_trips

EMIT_INTERVAL_MS = 5 * 60 * 1000  # README.md:13 — every 5 min of stream time

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("temp_sum", T.DoubleType()),
        T.StructField("n", T.LongType()),
        T.StructField("started", T.LongType()),
        T.StructField("ended", T.LongType()),
        T.StructField("update_time_ms", T.LongType()),
    ]
)

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("stationName", T.StringType()),
        T.StructField("eventDay", T.DateType()),
        T.StructField("avgTemperature", T.DoubleType()),
        T.StructField("startedTrips", T.LongType()),
        T.StructField("endedTrips", T.LongType()),
        T.StructField("updateTime", T.TimestampType()),
    ]
)


def _punctuate_fn(
    key: tuple,
    pdf_iter: Iterable[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    """Per-(station, day) state machine: update silently, emit on timer."""
    station, event_day = key

    if state.hasTimedOut:
        temp_sum, n, started, ended, update_ms = state.get
        yield pd.DataFrame(
            {
                "stationName": [station],
                "eventDay": [event_day],
                "avgTemperature": [temp_sum / n if n else None],
                "startedTrips": [started],
                "endedTrips": [ended],
                "updateTime": [pd.Timestamp(update_ms, unit="ms")],
            }
        )
        watermark_ms = state.getCurrentWatermarkMs()
        day_end_ms = (
            pd.Timestamp(event_day).value // 1_000_000 + 24 * 3600 * 1000
        )
        if day_end_ms < watermark_ms:
            # T4 eviction: the day has closed under the watermark.
            state.remove()
        else:
            state.setTimeoutTimestamp(watermark_ms + EMIT_INTERVAL_MS)
        return

    temp_sum, n, started, ended, update_ms = (0.0, 0, 0, 0, 0)
    if state.exists:
        temp_sum, n, started, ended, update_ms = state.get
    for pdf in pdf_iter:
        temp_sum += float(pdf["temperature"].sum())
        n += len(pdf)
        started += int((pdf["tripType"] == 1).sum())
        ended += int((pdf["tripType"] != 1).sum())
        batch_max_ms = pdf["tripTime"].max().value // 1_000_000
        update_ms = max(update_ms, batch_max_ms)
    state.update((temp_sum, n, started, ended, update_ms))
    # Arm the punctuator: fire once stream time advances one interval.
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + EMIT_INTERVAL_MS)
    # transform() returns null — only the punctuator emits.
    return


def punctuated_daily_agg(
    trips: DataFrame,
    stations: DataFrame,
    watermark: str = "1 day",
) -> DataFrame:
    """A1–A5 with faithful decoupled emission (T2) and eviction (T4)."""
    enriched = enrich_trips(trips, stations, on_miss="drop")
    return (
        enriched.withWatermark("tripTime", watermark)
        .select(
            "stationName",
            F.to_date("tripTime").alias("eventDay"),
            "tripTime",
            "tripType",
            "temperature",
        )
        .groupBy("stationName", "eventDay")
        .applyInPandasWithState(
            _punctuate_fn,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="EventTimeTimeout",
        )
    )

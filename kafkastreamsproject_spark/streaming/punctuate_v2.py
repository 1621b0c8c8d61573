"""Faithful stream-time punctuation (T2) + eviction (T4) on Spark 4's
``transformWithStateInPandas`` — the successor stateful API.

Same semantics as ``streaming/punctuate.py`` (see its module docstring
for the mapping to consumer/CustomTransformer.kt:45,56-80): records
only mutate state; a per-key event-time timer emits the aggregate when
the watermark advances one interval, and a key whose day has closed
under the watermark is evicted after its final emission.

Why a second implementation of the same operator:

- ``applyInPandasWithState`` is the portable API (any state store
  provider) — kept as the default path;
- ``transformWithStateInPandas`` is where Spark's stateful processing
  is headed (explicit state variables, first-class timers, TTL,
  initial-state bootstrap) and runs ONLY on the RocksDB state store
  provider — exactly the provider the 100 TB posture prescribes
  (ARCHITECTURE.md "Streaming"), so the scale path and the API path
  converge here.

API mapping (old → new): ``state.update/get/remove`` →
``ValueState.update/get/clear``; ``state.setTimeoutTimestamp`` →
``handle.deleteTimer + handle.registerTimer`` (registerTimer
ACCUMULATES timers where setTimeoutTimestamp replaced, hence the
explicit delete); ``state.hasTimedOut`` branch → ``handleExpiredTimer``
callback; ``state.getCurrentWatermarkMs`` →
``timerValues.getCurrentWatermarkInMs``.

The emitted rows are identical to ``punctuated_daily_agg``'s —
``tests/test_rocksdb_state.py`` parametrizes the punctuation test over
both operators.  Environment gate: TWS's Python state client speaks a
protobuf protocol, and ``google.protobuf`` is not installed in this
container (no network, no pip) — the parametrized test skips cleanly
today and runs unmodified the moment the dependency exists, mirroring
the Kafka-connector gate (COVERAGE.md S6).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from kafkastreamsproject_spark.operators.joins import enrich_trips
from kafkastreamsproject_spark.streaming.punctuate import (
    _OUTPUT_SCHEMA,
    _STATE_SCHEMA,
    EMIT_INTERVAL_MS,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class PunctuatedDailyAggProcessor(StatefulProcessor):
    """Per-(station, day) state machine: update silently, emit on timer."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._agg = handle.getValueState("agg", _STATE_SCHEMA)

    def _rearm(self, fire_at_ms: int) -> None:
        # registerTimer accumulates; the reference punctuator has ONE
        # pending punctuation per key — delete before re-arming.
        for ts in list(self._handle.listTimers()):
            self._handle.deleteTimer(ts)
        self._handle.registerTimer(fire_at_ms)

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        temp_sum, n, started, ended, update_ms = (0.0, 0, 0, 0, 0)
        prev = self._agg.get()
        if prev is not None:
            temp_sum, n, started, ended, update_ms = prev
        for pdf in rows:
            temp_sum += float(pdf["temperature"].sum())
            n += len(pdf)
            started += int((pdf["tripType"] == 1).sum())
            ended += int((pdf["tripType"] != 1).sum())
            batch_max_ms = pdf["tripTime"].max().value // 1_000_000
            update_ms = max(update_ms, batch_max_ms)
        self._agg.update((temp_sum, n, started, ended, update_ms))
        self._rearm(timerValues.getCurrentWatermarkInMs() + EMIT_INTERVAL_MS)
        # transform() returns null — only the punctuator emits.
        return iter(())

    def handleExpiredTimer(
        self,
        key: Any,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        station, event_day = key
        value = self._agg.get()
        if value is None:  # evicted concurrently; nothing to forward
            return iter(())
        temp_sum, n, started, ended, update_ms = value
        out = pd.DataFrame(
            {
                "stationName": [station],
                "eventDay": [event_day],
                "avgTemperature": [temp_sum / n if n else None],
                "startedTrips": [started],
                "endedTrips": [ended],
                "updateTime": [pd.Timestamp(update_ms, unit="ms")],
            }
        )
        watermark_ms = timerValues.getCurrentWatermarkInMs()
        day_end_ms = pd.Timestamp(event_day).value // 1_000_000 + 24 * 3600 * 1000
        if day_end_ms < watermark_ms:
            # T4 eviction: the day has closed under the watermark.
            self._agg.clear()
        else:
            self._rearm(watermark_ms + EMIT_INTERVAL_MS)
        return iter((out,))

    def close(self) -> None:  # reference close() is TODO(); ours is a no-op
        pass


def punctuated_daily_agg_v2(
    trips: DataFrame,
    stations: DataFrame,
    watermark: str = "1 day",
) -> DataFrame:
    """A1–A5 with faithful decoupled emission (T2) and eviction (T4) on
    the transformWithStateInPandas API.  Requires the RocksDB state
    store provider (``ROCKSDB_PROVIDER``) — set
    ``spark.sql.streaming.stateStore.providerClass`` before starting
    the query."""
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
        .transformWithStateInPandas(
            statefulProcessor=PunctuatedDailyAggProcessor(),
            outputStructType=_OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="eventTime",
        )
    )

"""Aggregation — the core of the reference (SURVEY.md §2.4, A1–A7).

The reference hand-rolls a RocksDB read-modify-write per record
(consumer/CustomTransformer.kt:22-46).  Spark-first, the whole thing is a
single ``groupBy().agg()``: Catalyst plans a partial (map-side) aggregate
before the shuffle, so at 100 TB each of the N input splits pre-combines
to ≤ |stations|×|days| rows before any data moves — the shuffle volume is
bounded by group cardinality, not input size.

Determinism decisions (SURVEY.md §7 M3):
- ``updateTime`` := max(event time), a deterministic stand-in for the
  reference's last-arrival stamp (CustomTransformer.kt:32,40) which is
  only well-defined under its single-partition execution.
- started counts ``type == 1`` — the CODE's semantics
  (CustomTransformer.kt:33-35), not the contradicting comment Trip.kt:8.
- ``avgTemperature`` uses plain ``avg``; the reference's incremental mean
  (CustomTransformer.kt:38-39) is algebraically identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_aggregate(
    trip_station: DataFrame,
    station_col: str = "stationName",
    time_col: str = "tripTime",
    type_col: str = "tripType",
    temp_col: str = "temperature",
    started_value: int = 1,
) -> DataFrame:
    """A1–A5: per (station, day) → started/ended counts, avg temp, max ts.

    Input: the enriched TripStation relation (operators.joins.enrich_trips).
    Output schema == schemas.AGGREGATED_INFO.
    """
    started = (F.col(type_col) == started_value).cast("long")
    return (
        trip_station.groupBy(
            F.col(station_col).alias("stationName"),
            F.to_date(F.col(time_col)).alias("eventDay"),
        )
        .agg(
            F.avg(temp_col).alias("avgTemperature"),
            F.sum(started).alias("startedTrips"),
            F.sum(1 - started).alias("endedTrips"),
            F.max(time_col).alias("updateTime"),
        )
    )


def windowed_station_counts(
    trip_station: DataFrame,
    period_minutes: int,
    station_col: str = "stationName",
    time_col: str = "tripTime",
    type_col: str = "tripType",
    docks_col: str = "stationTotalDocks",
    started_value: int = 1,
    collect_times: bool = False,
) -> DataFrame:
    """A6: tumbling window × station → started/ended counts + totalDocks.

    Mirrors model/anomalyDetection/TripStationCount.kt:7-17.  ``totalDocks``
    is constant within a station group → ``first``.  The reference also
    collects the contributing event times (dateTimeList) — expensive and
    unbounded at scale, so it is opt-in (``collect_times``); when on, the
    list is sorted for determinism (the reference's order is arrival order,
    undefined under parallelism).
    """
    started = (F.col(type_col) == started_value).cast("long")
    aggs = [
        F.sum(started).alias("started"),
        F.sum(1 - started).alias("ended"),
        F.first(docks_col).alias("totalDocks"),
    ]
    if collect_times:
        aggs.append(F.sort_array(F.collect_list(time_col)).alias("dateTimeList"))
    return trip_station.groupBy(
        F.window(F.col(time_col), f"{period_minutes} minutes").alias("window"),
        F.col(station_col).alias("stationName"),
    ).agg(*aggs)


def anomaly_summary(
    counts: DataFrame,
    threshold_pct: float | None = None,
) -> DataFrame:
    """A7 + P7/P8: derive surplus columns and the dock-saturation ratio.

    Mirrors TripStationSummaryInfo.kt:17-25:
    ``returnedOverRented = max(ended-started, 0)``,
    ``rentedOverReturned = max(started-ended, 0)``,
    ``nToDocksRatio = |ended-started| / totalDocks``.
    ``threshold_pct`` is the scripts' D parameter (processing.sh:12 →
    D=10 ⇒ keep ratio ≥ 0.10); None keeps all rows.
    """
    started, ended, docks = F.col("started"), F.col("ended"), F.col("totalDocks")
    out = counts.select(
        "window",
        "stationName",
        F.when(ended > started, ended - started).otherwise(F.lit(0)).alias(
            "returnedOverRented"
        ),
        F.when(started > ended, started - ended).otherwise(F.lit(0)).alias(
            "rentedOverReturned"
        ),
        docks.alias("totalDocks"),
        (F.abs(ended - started) / docks.cast("double")).alias("nToDocksRatio"),
    )
    if threshold_pct is not None:
        out = out.filter(F.col("nToDocksRatio") >= threshold_pct / 100.0)
    return out

"""Semantic-fidelity tests on the reference's own domain (trips/stations).

Fixture shapes follow FIXTURES.md §A (reference model/Trip.kt:6-16,
model/Station.kt:3-12).  These pin the behaviors SURVEY.md §2 calls out:
started counts type==1 (the code, not the comment), fail-on-miss join,
surplus/ratio math, and the A4 incremental-mean ≡ avg equivalence.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.errors.exceptions.captured import SparkRuntimeException

from kafkastreamsproject_spark.operators.aggregation import (
    anomaly_summary,
    daily_aggregate,
    windowed_station_counts,
)
from kafkastreamsproject_spark.operators.joins import enrich_trips
from kafkastreamsproject_spark.schemas import STATION, TRIP


def _ts(day: int, hour: int, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 3, day, hour, minute, 0)


@pytest.fixture(scope="module")
def trips(spark):
    rows = [
        # (id, type, dateTime, stationId, duration, userType, gender, week, temperature, events)
        (1, 1, _ts(1, 8), 168, 300.0, "Subscriber", "Male", 9, 10.0, "clear"),
        (2, 0, _ts(1, 9), 168, 600.0, "Customer", "Female", 9, 14.0, "clear"),
        (3, 1, _ts(1, 10), 42, 120.0, "Subscriber", "", 9, -2.0, "snow"),
        (4, 1, _ts(2, 8), 168, 240.0, "Customer", "Male", 9, 8.0, "rain"),
        (5, 0, _ts(2, 8, 30), 42, 500.0, "Subscriber", "Female", 9, 6.0, "rain"),
        (6, 0, _ts(2, 9), 42, 500.0, "Subscriber", "Female", 9, 7.0, "rain"),
    ]
    return spark.createDataFrame(rows, TRIP)


@pytest.fixture(scope="module")
def stations(spark):
    rows = [
        (168, "Michigan Ave", 24, 20, "In Service", 41.88, -87.62, "POINT"),
        (42, "Wabash Ave", 10, 10, "In Service", 41.89, -87.63, "POINT"),
    ]
    return spark.createDataFrame(rows, STATION)


def test_enrich_join_17_columns(trips, stations):
    out = enrich_trips(trips, stations)
    assert len(out.columns) == 17
    row = out.filter(out.tripId == 1).first()
    assert row.stationName == "Michigan Ave"
    assert row.stationTotalDocks == 24
    assert row.tripTime == _ts(1, 8)


def test_enrich_join_fail_on_miss(spark, trips, stations):
    # A trip pointing at an unknown station must raise (KafkaConsumer.kt:46).
    bad = spark.createDataFrame(
        [(99, 1, _ts(1, 8), 777, 1.0, "x", "y", 1, 0.0, "clear")], TRIP
    )
    with pytest.raises(SparkRuntimeException):
        enrich_trips(trips.unionAll(bad), stations).count()


def test_enrich_join_drop_mode(spark, trips, stations):
    bad = spark.createDataFrame(
        [(99, 1, _ts(1, 8), 777, 1.0, "x", "y", 1, 0.0, "clear")], TRIP
    )
    out = enrich_trips(trips.unionAll(bad), stations, on_miss="drop")
    assert out.count() == 6


def test_daily_aggregate_semantics(trips, stations):
    agg = daily_aggregate(enrich_trips(trips, stations))
    res = {(r.stationName, str(r.eventDay)): r for r in agg.collect()}
    assert len(res) == 4
    r = res[("Michigan Ave", "2024-03-01")]
    # type==1 counts as STARTED (CustomTransformer.kt:33-35).
    assert r.startedTrips == 1 and r.endedTrips == 1
    assert r.avgTemperature == pytest.approx(12.0)
    assert r.updateTime == _ts(1, 9)
    r2 = res[("Wabash Ave", "2024-03-02")]
    assert r2.startedTrips == 0 and r2.endedTrips == 2


def test_incremental_mean_equals_avg(trips, stations):
    """A4: the reference's running mean (n*avg + t)/(n+1) is plain avg."""
    rows = enrich_trips(trips, stations).collect()
    by_key: dict = {}
    for r in sorted(rows, key=lambda r: r.tripTime):
        k = (r.stationName, r.tripTime.date())
        n, avg = by_key.get(k, (0, 0.0))
        by_key[k] = (n + 1, (n * avg + r.temperature) / (n + 1))
    agg = daily_aggregate(enrich_trips(trips, stations))
    for r in agg.collect():
        n, avg = by_key[(r.stationName, r.eventDay)]
        assert r.avgTemperature == pytest.approx(avg, abs=1e-9)
        assert r.startedTrips + r.endedTrips == n


def test_windowed_counts_and_anomaly(trips, stations):
    counts = windowed_station_counts(
        enrich_trips(trips, stations), period_minutes=60, collect_times=True
    )
    rows = {(r.stationName, r.window.start): r for r in counts.collect()}
    r = rows[("Wabash Ave", _ts(2, 8))]
    assert r.started == 0 and r.ended == 1
    assert r.dateTimeList == [_ts(2, 8, 30)]

    # Anomaly: |ended-started|/totalDocks, thresholded (D=5 ⇒ ≥0.05).
    summary = anomaly_summary(counts, threshold_pct=5.0)
    srows = {(r.stationName, r.window.start): r for r in summary.collect()}
    s = srows[("Wabash Ave", _ts(2, 8))]
    assert s.returnedOverRented == 1 and s.rentedOverReturned == 0
    assert s.nToDocksRatio == pytest.approx(0.1)
    # a 0-delta window must be filtered out
    assert ("Michigan Ave", _ts(1, 8)) in rows


def test_approx_distinct_bounded_error(spark, sf_dir):
    """The registered query's contract: per event type, the exact
    distinct count (DuckDB-checkable) plus a Spark-computed within_3rsd
    flag over the HLL estimate (rsd=0.02).  Pin both sides: exact_users
    equals the exact twin, and the 3·rsd = 6% envelope holds (so the
    driver row hashes TRUE deterministically)."""
    from kafkastreamsproject_spark.plans.registry import all_queries
    from kafkastreamsproject_spark.plans.relational import distinct_counts

    specs = all_queries()
    got = {
        r.event_type: r
        for r in specs["approx_distinct_users"].spark(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n_users
        for r in distinct_counts(spark, sf_dir).collect()
    }
    assert set(got) == set(exact)
    for k, v in exact.items():
        assert got[k].exact_users == v, (k, got[k].exact_users, v)
        assert got[k].within_3rsd is True, (k, got[k])


def test_enrich_join_null_mode(spark, trips, stations):
    from kafkastreamsproject_spark.operators.joins import broadcast_enrich
    from kafkastreamsproject_spark.schemas import TRIP

    bad = spark.createDataFrame(
        [(99, 1, _ts(1, 8), 777, 1.0, "x", "y", 1, 0.0, "clear")], TRIP
    )
    out = broadcast_enrich(
        trips.unionAll(bad), stations.withColumnRenamed("id", "sid"),
        "stationId", "sid", on_miss="null",
    )
    assert out.count() == 7
    miss = out.filter(out.stationId == 777).first()
    assert miss.name is None  # null-padded, not dropped, not raised


def test_anomaly_summary_unthresholded(trips, stations):
    from kafkastreamsproject_spark.operators.aggregation import (
        anomaly_summary,
        windowed_station_counts,
    )
    from kafkastreamsproject_spark.operators.joins import enrich_trips

    counts = windowed_station_counts(enrich_trips(trips, stations), 60)
    all_rows = anomaly_summary(counts, threshold_pct=None)
    # None keeps every window, including ones below any threshold
    # (Michigan 08:00: |1-0|/24 ≈ 0.042)
    assert all_rows.count() == counts.count()
    assert all_rows.filter(all_rows.nToDocksRatio < 0.05).count() > 0


def test_load_tables_loads_everything(spark, sf_dir):
    from kafkastreamsproject_spark.schemas import TESTDATA_TABLES
    from kafkastreamsproject_spark.sources.testdata import load_tables

    tables = load_tables(spark, sf_dir)
    assert set(tables) == set(TESTDATA_TABLES)
    assert tables["events"].schema["ts"].dataType.typeName() == "timestamp"
    for name, df in tables.items():
        assert df.count() > 0, name

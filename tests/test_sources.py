"""Batch CSV source tests (S1–S3, S7): explicit schemas, the reference's
timestamp format, and FAILFAST on malformed rows."""

from __future__ import annotations

import pytest

from kafkastreamsproject_spark.sources.csv import read_stations_csv, read_trips_csv


@pytest.fixture()
def station_csv(tmp_path):
    p = tmp_path / "stations.csv"
    p.write_text(
        "ID,name,totalDocks,docksInService,status,lat,lon,location\n"
        "168,Michigan Ave,24,20,In Service,41.88,-87.62,POINT\n"
        "42,Wabash Ave,10,10,In Service,41.89,-87.63,POINT\n"
    )
    return str(p)


@pytest.fixture()
def trip_csv(tmp_path):
    p = tmp_path / "trips.csv"
    p.write_text(
        "trip_id,type,dateTime,stationId,duration,userType,gender,week,temperature,events\n"
        "1,1,2024-03-01T08:00:00.000Z,168,300.0,Subscriber,Male,9,10.0,clear\n"
        "2,0,2024-03-01T09:30:15.250Z,42,600.0,Customer,Female,9,14.5,rain\n"
    )
    return str(p)


def test_read_stations(spark, station_csv):
    df = read_stations_csv(spark, station_csv)
    rows = {r.id: r for r in df.collect()}
    assert rows[168].name == "Michigan Ave"
    assert rows[168].totalDocks == 24
    assert df.schema["totalDocks"].dataType.typeName() == "long"


def test_read_trips_timestamp_format(spark, trip_csv):
    df = read_trips_csv(spark, trip_csv)
    rows = {r.id: r for r in df.collect()}
    assert rows[2].dateTime.microsecond == 250000
    assert rows[1].type == 1 and rows[1].stationId == 168


def test_failfast_on_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text(
        "trip_id,type,dateTime,stationId,duration,userType,gender,week,temperature,events\n"
        "notanint,1,2024-03-01T08:00:00.000Z,168,300.0,s,m,9,10.0,clear\n"
    )
    with pytest.raises(Exception):
        read_trips_csv(spark, str(p)).collect()

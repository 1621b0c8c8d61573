"""Bucketed interval-overlap join: equivalence with the naive non-equi
join, emit-once (no duplicate pairs), and closed-interval edge cases."""

from __future__ import annotations

import datetime as dt

import pytest

from kafkastreamsproject_spark.operators.intervaljoin import overlap_join


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture(scope="module")
def intervals(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(1, 10), _ts(1, 12)),      # within one day
            (2, _ts(2, 23), _ts(3, 1)),       # crosses midnight
            (3, _ts(5, 0), _ts(9, 0)),        # spans 5 buckets
            (4, _ts(20, 8), _ts(20, 9)),      # no partner
        ],
        "lid int, s_start timestamp, s_end timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts(1, 11), _ts(1, 14)),     # overlaps lid=1
            (20, _ts(3, 0), _ts(3, 2)),       # overlaps lid=2 (after midnight)
            (30, _ts(6, 0), _ts(7, 0)),       # inside lid=3
            (40, _ts(9, 0), _ts(10, 0)),      # touches lid=3 at the endpoint
            (50, _ts(15, 0), _ts(16, 0)),     # no partner
        ],
        "rid int, i_start timestamp, i_end timestamp",
    )
    return left, right


def _pairs(df):
    return {(r.lid, r.rid) for r in df.select("lid", "rid").collect()}


def test_matches_naive_nonequi_join(intervals, spark):
    left, right = intervals
    got = overlap_join(
        left, right, "s_start", "s_end", "i_start", "i_end", 86_400
    )
    naive = left.join(
        right,
        (left.s_start <= right.i_end) & (right.i_start <= left.s_end),
    )
    assert _pairs(got) == _pairs(naive) == {(1, 10), (2, 20), (3, 30), (3, 40)}


def test_emit_once_no_duplicates(intervals):
    left, right = intervals
    rows = overlap_join(
        left, right, "s_start", "s_end", "i_start", "i_end", 86_400
    ).collect()
    pairs = [(r.lid, r.rid) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_bucket_width_invariance(intervals):
    left, right = intervals
    by_day = overlap_join(
        left, right, "s_start", "s_end", "i_start", "i_end", 86_400
    )
    by_hour = overlap_join(
        left, right, "s_start", "s_end", "i_start", "i_end", 3_600
    )
    assert _pairs(by_day) == _pairs(by_hour)


def test_rejects_column_clash_and_bad_width(intervals):
    left, right = intervals
    with pytest.raises(ValueError):
        overlap_join(
            left.withColumnRenamed("s_start", "i_start"),
            right, "i_start", "s_end", "i_start", "i_end",
        )
    with pytest.raises(ValueError):
        overlap_join(
            left, right, "s_start", "s_end", "i_start", "i_end", 0
        )

"""As-of / range-join operator tests: crafted edges the oracle data
doesn't exercise (ties, no-match rows, strict mode, band fast path)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafkastreamsproject_spark.operators.asof import (
    asof_join,
    band_range_join,
    regular_band,
)
from kafkastreamsproject_spark.sources.testdata import load_table


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


def test_asof_join_edges(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts(0), 100.0),
            (1, _ts(10), 101.0),
            (1, _ts(20), 102.0),
            (2, _ts(15), 55.0),
        ],
        "sym int, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, _ts(5), "t1"),    # → 10:00 quote
            (1, _ts(10), "t2"),   # tie: at-or-before includes 10:10
            (1, _ts(25), "t3"),   # → 10:20 quote
            (2, _ts(10), "t4"),   # before any quote → dropped
            (3, _ts(30), "t5"),   # unknown key → dropped
        ],
        "sym int, tts timestamp, tid string",
    )
    out = asof_join(trades, quotes, "sym", "tts", "qts", ["px"])
    got = {r.tid: (r.asof_qts, r.asof_px) for r in out.collect()}
    assert got == {
        "t1": (_ts(0), 100.0),
        "t2": (_ts(10), 101.0),
        "t3": (_ts(20), 102.0),
    }

    strict = asof_join(trades, quotes, "sym", "tts", "qts", ["px"], strict=True)
    sgot = {r.tid: r.asof_px for r in strict.collect()}
    # strictly-before: the 10:10 trade must NOT see the 10:10 quote
    assert sgot["t2"] == 100.0


def test_regular_band_equals_range_join(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    bands = spark.createDataFrame(
        [(i, i * 10.0, (i + 1) * 10.0, f"b{i}") for i in range(6)],
        "band_id int, lo double, hi double, label string",
    )
    via_join = (
        band_range_join(li, bands, "l_quantity")
        .groupBy("band_id")
        .count()
        .collect()
    )
    via_arith = (
        li.withColumn("band_id", regular_band(F.col("l_quantity"), 0.0, 10.0))
        .groupBy("band_id")
        .count()
        .collect()
    )
    assert {(r.band_id, r["count"]) for r in via_join} == {
        (r.band_id, r["count"]) for r in via_arith
    }

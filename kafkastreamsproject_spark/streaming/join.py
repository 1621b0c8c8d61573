"""Stream–stream interval join — beyond the reference's J1.

The reference only joins stream×static.  A real trip pipeline also
wants stream×stream: pair each trip START with the next END at the
same station within a time horizon.  Structured Streaming's
watermarked interval join keeps both sides' state bounded: a START is
retained only until its horizon passes the watermark, then dropped.

State size ∝ (event rate × horizon), independent of stream length —
the property that makes this run forever at production rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def start_end_pairs(
    trips: DataFrame,
    horizon_minutes: int = 90,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Pair started trips (type==1) with ended trips (type!=1) at the
    same station where the end falls in (start, start + horizon].

    Append-mode output: a pair emits once the watermark closes the
    interval.  Cardinality note: this is every-start × every-qualifying-
    end (not first-end matching, which needs per-key state; see
    streaming/punctuate.py for that machinery).
    """
    starts = (
        trips.filter(F.col("type") == 1)
        .select(
            F.col("stationId").alias("s_station"),
            F.col("id").alias("start_id"),
            F.col("dateTime").alias("start_time"),
        )
        .withWatermark("start_time", watermark)
    )
    ends = (
        trips.filter(F.col("type") != 1)
        .select(
            F.col("stationId").alias("e_station"),
            F.col("id").alias("end_id"),
            F.col("dateTime").alias("end_time"),
        )
        .withWatermark("end_time", watermark)
    )
    cond = (
        (F.col("s_station") == F.col("e_station"))
        & (F.col("end_time") > F.col("start_time"))
        & (
            F.col("end_time")
            <= F.col("start_time") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return starts.join(ends, cond, "inner").select(
        F.col("s_station").alias("stationId"),
        "start_id",
        "end_id",
        "start_time",
        "end_time",
        (
            (F.unix_micros("end_time") - F.unix_micros("start_time")) / 60_000_000.0
        ).alias("gap_minutes"),
    )

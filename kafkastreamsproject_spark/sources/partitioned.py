"""Date-partitioned materialization — the storage layout that makes the
daily/window queries cheap at 100 TB.

``write.partitionBy(date_col)`` lays the table out as one directory per
day; any query filtering on the partition column prunes whole
directories at PLANNING time (PartitionFilters in the scan node) —
the scan never opens the other days' files.  At 100 TB this is the
difference between reading 100 TB and reading one day's slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def materialize_events_by_day(
    events: DataFrame, path: str, ts_col: str = "ts"
) -> None:
    """Write events partitioned by event date (directory per day)."""
    (
        events.withColumn("event_day", F.to_date(ts_col))
        .write.mode("overwrite")
        .partitionBy("event_day")
        .parquet(path)
    )


def read_partitioned_events(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)

"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the single biggest recurring cost is re-shuffling the fact
table on its join key for every query.  Bucketing amortizes it:
``write.bucketBy(n, key).sortBy(key)`` materializes the table already
hash-partitioned; any later equi-join or aggregation on the bucket key
reads co-located buckets and skips the Exchange entirely (verified in
tests/test_scale_ops.py by asserting the bucketed join plans zero
shuffles).  Pick n_buckets so a bucket ≈ one task's worth of data
(128–512 MB); both join sides must share n_buckets and key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed managed table (overwrite)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)

"""Distributed prefix scan: running aggregates over a total order
WITHOUT a global single-partition sort.

A plain ``max(x) OVER (ORDER BY k)`` window has an empty PARTITION BY,
so Spark plans one task holding every row — the classic scale cliff.
The standard fix is the two-level scan (the same decomposition GPU /
MPI prefix-sum uses): bucket rows by a range of the order key, compute
the running aggregate within each bucket in parallel, aggregate one
row per bucket, run the tiny cross-bucket scan on those, and combine.
Only |buckets| rows ever sit in one task.

Used by the skyline query (plans/relational.py:skyline_price_quantity);
any monotone running aggregate (max/min/sum) decomposes the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def bucketed_prefix_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    bucket_width: float,
    out_col: str = "prev_max",
) -> DataFrame:
    """Append ``out_col`` = max of ``value_col`` over all rows STRICTLY
    BEFORE this row in ``order_col`` order (null for the first row) —
    an exclusive running max.

    Precondition: ``order_col`` values are unique (group duplicates
    first); the scan is deterministic and exactly equal to the
    single-window formulation (pinned in tests/test_scale_ops.py).

    Scale shape: one shuffle on the bucket key for the intra-bucket
    windows (each task scans one bucket), a |buckets|-row aggregate for
    the cross-bucket scan (the only single-task step, sized by
    value-range / bucket_width — pick the width from a range stat so
    |buckets| stays ~1e4 at any corpus size), and a broadcast join to
    re-attach the bucket prefixes.  No task ever holds more than one
    bucket of rows.
    """
    bucket = F.floor(F.col(order_col) / F.lit(bucket_width)).alias("__bucket")
    rows = df.select("*", bucket)

    w_intra = (
        W.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    intra = rows.withColumn("__intra", F.max(value_col).over(w_intra))

    bstats = rows.groupBy("__bucket").agg(F.max(value_col).alias("__bmax"))
    w_cross = (
        W.orderBy("__bucket").rowsBetween(W.unboundedPreceding, -1)
    )
    bprefix = bstats.select(
        "__bucket", F.max("__bmax").over(w_cross).alias("__bprev")
    )

    combined = _null_safe_max(F.col("__intra"), F.col("__bprev"))
    return (
        intra.join(F.broadcast(bprefix), "__bucket")
        .withColumn(out_col, combined)
        .drop("__bucket", "__intra", "__bprev")
    )


def _null_safe_max(a: Column, b: Column) -> Column:
    """max(a, b) where null means "no preceding row": null only when
    BOTH are null (greatest() alone would do, but its null handling is
    engine-specific — spell the cases out)."""
    return (
        F.when(a.isNull(), b)
        .when(b.isNull(), a)
        .otherwise(F.greatest(a, b))
    )

"""Bucketed interval-overlap join: non-equi overlap as a bin-wise
equi-join.

Spark has no native interval join; the naive formulation
(``a.join(b, a.start <= b.end && b.start <= a.end)``) plans as a
BroadcastNestedLoopJoin (or worse), which is O(|a|·|b|) and only
tolerable when one side is tiny.  The standard scalable device — the
same one Spark's own stream-stream interval join and range-join-hinted
engines use internally — is BINNING:

1. explode every interval into the fixed-width time buckets it covers;
2. equi-join on the bucket id (a plain, AQE-optimizable shuffle join
   whose cost is Σ per-bucket |a_bucket|·|b_bucket|, local in time);
3. keep each matched pair exactly once — in the FIRST bucket the two
   intervals share, which for overlapping intervals is always the
   bucket of the later start (both intervals cover their own start,
   and overlap means the later start lies inside the earlier interval);
4. re-check the exact overlap predicate to drop same-bucket non-overlaps.

The emit-once rule makes the join duplicate-free WITHOUT a distinct —
no wide dedup shuffle.  Bucket width trades replication (long intervals
explode into more buckets) against bucket occupancy; pick it near the
typical interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: str, width_us: int) -> Column:
    return F.floor(F.unix_micros(F.col(col)) / F.lit(width_us))


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """All (left, right) row pairs whose [start, end] intervals overlap
    (closed-interval semantics: touching endpoints count).

    Column names of ``left`` and ``right`` must be disjoint; the output
    carries both sides' columns, one row per overlapping pair.
    """
    clash = set(left.columns) & set(right.columns)
    if clash:
        raise ValueError(f"overlapping column names: {sorted(clash)}")
    if bucket_seconds < 1:
        raise ValueError(f"bucket_seconds must be >= 1, got {bucket_seconds}")
    width_us = bucket_seconds * 1_000_000

    lb = left.withColumn(
        "_ov_bucket",
        F.explode(F.sequence(_bucket(l_start, width_us), _bucket(l_end, width_us))),
    )
    rb = right.withColumn(
        "_ov_bucket",
        F.explode(F.sequence(_bucket(r_start, width_us), _bucket(r_end, width_us))),
    )
    first_shared = F.greatest(_bucket(l_start, width_us), _bucket(r_start, width_us))
    return (
        lb.join(rb, "_ov_bucket")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_ov_bucket") == first_shared)
        )
        .drop("_ov_bucket")
    )

"""Distributed prefix scan: running aggregates over a total order
WITHOUT a global single-partition sort.

A plain ``max(x) OVER (ORDER BY k)`` window has an empty PARTITION BY,
so Spark plans one task holding every row — the classic scale cliff.
The standard fix is the two-level scan (the same decomposition GPU /
MPI prefix-sum uses): bucket rows by a range of the order key, compute
the running aggregate within each bucket in parallel, aggregate one
row per bucket, run the tiny cross-bucket scan on those, and combine.
Only |buckets| rows ever sit in one task.

The device family: :func:`bucketed_prefix_max` (exclusive running max —
drives the 2-D skyline), :func:`bucketed_rank` (global ROW_NUMBER —
drives the Gini rank identity and, with :func:`ntile_from_rank`, exact
NTILE quantile grids), and :func:`bucketed_running_sum` (inclusive
running sum with caller-chosen monotone buckets — drives the sweep-line
family).  Each is pinned exactly equal to its single-window formulation
in tests/test_scale_ops.py, and the plan-hygiene gate
(testing/planaudit.py) recognizes the cross-bucket scans by their
``__``-prefixed bucket columns — keep that naming in new variants.
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


def bucketed_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    ascending: bool = True,
    n_buckets: int = 64,
    out_col: str = "rk",
) -> DataFrame:
    """Append ``out_col`` = ``ROW_NUMBER() OVER (ORDER BY value_col
    [DESC], tiebreak_col)`` — the GLOBAL dense 1-based rank — computed
    by the two-level scan instead of a single-task sort.

    Decomposition: range-bucket rows on ``value_col`` (the bucket key
    is a monotone function of the sort key, so bucket order equals
    value order and ties always land in one bucket), rank within each
    bucket in parallel, count rows per bucket, run the exclusive
    prefix-sum of counts over the |n_buckets|-row aggregate (the only
    single-task step), and add the bucket's row offset to each local
    rank.  Exactly equal to the global window formulation — pinned in
    tests/test_scale_ops.py — because concatenating buckets in key
    order, each internally sorted, IS the global sort.

    Bucketing casts ``value_col`` to double only for bucket ASSIGNMENT
    (monotone, so ties/rounding can merge buckets but never split an
    order inversion); the intra-bucket ORDER uses the original column,
    so decimal exactness is preserved where it matters.

    Scale shape: one shuffle on the bucket key, one |n_buckets|-row
    single-task scan, one broadcast join of |n_buckets| offsets — no
    task ever holds more than one bucket of rows.
    """
    v = F.col(value_col).cast("double")
    ordv = v if ascending else -v
    bounds = df.agg(F.min(ordv).alias("__lo"), F.max(ordv).alias("__hi"))
    width = F.greatest(
        (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets)),
        F.lit(1e-12),
    )
    bucket = F.least(
        F.floor((ordv - F.col("__lo")) / width),
        F.lit(n_buckets - 1),
    ).cast("long")
    rows = df.join(F.broadcast(bounds)).select(
        "*", bucket.alias("__bucket")
    ).drop("__lo", "__hi")

    order = (
        [F.col(value_col).asc(), F.col(tiebreak_col).asc()]
        if ascending
        else [F.col(value_col).desc(), F.col(tiebreak_col).asc()]
    )
    w_intra = W.partitionBy("__bucket").orderBy(*order)
    ranked = rows.withColumn("__intra", F.row_number().over(w_intra))

    counts = rows.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
    w_off = W.orderBy("__bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "__bucket", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    return (
        ranked.join(F.broadcast(offsets), "__bucket")
        .withColumn(out_col, F.col("__intra") + F.col("__off"))
        .drop("__bucket", "__intra", "__off")
    )


def ntile_from_rank(rk: Column, n: Column, n_tiles: int) -> Column:
    """SQL ``NTILE(n_tiles)`` recovered ROW-LOCALLY from a precomputed
    global rank ``rk`` (1-based) and total row count ``n`` — so quantile
    bucketing composes with :func:`bucketed_rank` instead of needing its
    own single-task sort.  NTILE's contract: the first ``n mod t``
    buckets get ``ceil(n/t)`` rows, the rest ``floor(n/t)``."""
    q = F.floor(n / n_tiles)
    r = n % n_tiles
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading buckets
    return F.when(
        rk <= big, F.floor((rk - 1) / (q + 1)) + 1
    ).otherwise(r + F.floor((rk - big - 1) / q) + 1)


def bucketed_running_sum(
    df: DataFrame,
    bucket_col: str,
    order_cols: list,
    value_col: str,
    out_col: str = "running",
) -> DataFrame:
    """Append ``out_col`` = ``SUM(value_col) OVER (ORDER BY order_cols
    ROWS UNBOUNDED PRECEDING)`` — the global INCLUSIVE running sum —
    without a single-task sort, given a caller-chosen ``bucket_col``
    that is monotone non-decreasing along the global order (e.g. the
    DAY of an event-time order key: coarser, but never inverted).

    Same two-level scan as :func:`bucketed_rank`: per-bucket running
    sums in parallel, per-bucket totals aggregated to |buckets| rows,
    exclusive prefix-sum of totals as the tiny cross-bucket scan, and a
    broadcast join adds each bucket's carry-in.  The sweep-line family
    (peak concurrency, inventory level, open-interval counts) reads its
    answer off max/min of this column.
    """
    w_intra = (
        W.partitionBy(bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    intra = df.withColumn("__intra", F.sum(value_col).over(w_intra))

    totals = df.groupBy(bucket_col).agg(F.sum(value_col).alias("__tot"))
    w_carry = W.orderBy(bucket_col).rowsBetween(W.unboundedPreceding, -1)
    carry = totals.select(
        bucket_col, F.coalesce(F.sum("__tot").over(w_carry), F.lit(0)).alias("__carry")
    )
    return (
        intra.join(F.broadcast(carry), bucket_col)
        .withColumn(out_col, F.col("__intra") + F.col("__carry"))
        .drop("__intra", "__carry")
    )

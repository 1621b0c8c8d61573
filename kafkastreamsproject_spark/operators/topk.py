"""Global top-k that plans as TakeOrderedAndProject, never a full sort.

The window idiom ``row_number().over(Window.orderBy(...))`` followed by
``filter(rk <= k)`` is the natural way to WRITE a top-k, but it plans
as Exchange SinglePartition → Sort → Window: one task sorts the whole
input, which is a scale cliff whenever the ranked table grows with the
corpus.  ``orderBy(...).limit(k)`` plans as TakeOrderedAndProject —
each partition keeps its local top-k and the driver merges k-sized
heaps — so the single-task work is O(k · n_partitions), independent of
input size.

Every registry query that ranks a corpus-growing input routes through
:func:`top_k`; tests/test_plans.py enforces the plan shape by rejecting
unpartitioned Window nodes outside an explicit allowlist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def top_k(
    df: DataFrame,
    order_cols: list[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the first ``k`` rows of ``df`` under ``order_cols`` (which
    must be a deterministic total order — include a tie-break column).

    When ``rank_col`` is given, the 1-based position is re-derived AFTER
    the limit with a window over the k-row result — bounded by k, so the
    single-partition window the plan shows is O(k), not O(input).
    """
    out = df.orderBy(*order_cols).limit(k)
    if rank_col is not None:
        w = W.orderBy(*order_cols)
        out = out.withColumn(rank_col, F.row_number().over(w).cast("int"))
    return out

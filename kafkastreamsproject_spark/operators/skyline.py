"""Distributed multi-dimensional skyline (Pareto frontier).

The 2-D skyline reduces to an exclusive running max
(plans/relational.py:skyline_price_quantity + operators/prefixscan.py);
in 3+ dimensions no single sort order linearizes dominance, so the
engine uses the classic two-phase distributed algorithm:

1. **Local skylines.**  Distinct points (with multiplicity) are hashed
   into blocks; each block computes its own skyline with a vectorized
   O(n_block²) dominance matrix (numpy, Arrow-batched via
   ``applyInPandas``).  Correctness needs no particular partitioning:
   a globally dominated point is dominated by SOME point, and if that
   dominator shares its block the point dies locally; if not, phase 2
   kills it.  Global skyline ⊆ union of local skylines always.
2. **Global confirm.**  The union of local skylines (≪ input — skyline
   sizes grow polylogarithmically for independent dims) is confirmed
   relationally: a candidate survives iff NO other candidate dominates
   it (broadcast non-equi anti-join over the candidate set only).

Phase 1 is the one place Python touches data, justified because
multi-dim dominance is not expressible with Spark's built-in
relational operators; it is Arrow-batched and O(n_block²) with
n_block = |distinct points| / n_blocks, so the caller sizes n_blocks
to bound per-task work.  The final result is the EXACT skyline,
independent of partitioning and block count (pinned by tests).

All dimensions are normalized to MINIMIZE internally (maximize dims
negate), and dominance is all-≤ with at least one <.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _local_skyline(pdf: pd.DataFrame, value_cols: list[str]) -> pd.DataFrame:
    """Brute-force skyline of one block: vectorized dominance matrix."""
    import numpy as np

    if len(pdf) <= 1:
        return pdf.drop(columns=["_blk"])
    v = pdf[value_cols].to_numpy(dtype="float64")  # minimized dims
    n = len(v)
    # dom[i, j] = point i dominates point j
    le = (v[:, None, :] <= v[None, :, :]).all(axis=2)
    lt = (v[:, None, :] < v[None, :, :]).any(axis=2)
    dom = le & lt
    np.fill_diagonal(dom, False)
    keep = ~dom.any(axis=0)
    return pdf.loc[keep].drop(columns=["_blk"])


def skyline(
    df: DataFrame, dims: dict[str, str], n_blocks: int = 32
) -> DataFrame:
    """Exact skyline of ``df`` over ``dims`` (col -> "min" | "max").

    Returns the distinct non-dominated points with their row counts:
    columns = dims… + n_rows.
    """
    for col, sense in dims.items():
        if sense not in ("min", "max"):
            raise ValueError(f"{col}: sense must be min or max, got {sense}")
    cols = list(dims)
    pts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_rows"))

    def minimized(c: str) -> Column:
        raw = F.col(c).cast("double")
        return (-raw if dims[c] == "max" else raw).alias(f"_m_{c}")

    mcols = [f"_m_{c}" for c in cols]
    blk = (
        F.abs(F.hash(*[F.col(c) for c in cols])) % n_blocks
    ).alias("_blk")
    with_m = pts.select("*", *[minimized(c) for c in cols], blk)

    schema = with_m.drop("_blk").schema
    local = with_m.groupBy("_blk").applyInPandas(
        lambda pdf: _local_skyline(pdf, mcols), schema=schema
    )

    a = local.select(
        *[F.col(c).alias(f"a_{c}") for c in cols],
        *[F.col(m).alias(f"a{m}") for m in mcols],
        F.col("n_rows"),
    )
    b = local.select(*[F.col(m).alias(f"b{m}") for m in mcols])
    all_le = None
    any_lt = None
    for m in mcols:
        le = F.col(f"b{m}") <= F.col(f"a{m}")
        lt = F.col(f"b{m}") < F.col(f"a{m}")
        all_le = le if all_le is None else (all_le & le)
        any_lt = lt if any_lt is None else (any_lt | lt)
    dominated_by = all_le & any_lt
    confirmed = a.join(F.broadcast(b), dominated_by, "left_anti")
    return confirmed.select(
        *[F.col(f"a_{c}").alias(c) for c in cols], "n_rows"
    )


def brute_force_skyline(
    rows: Iterable[tuple], senses: list[str]
) -> set[tuple]:
    """Pure-Python reference for tests: non-dominated tuples."""
    pts = set(rows)

    def dominates(s: tuple, r: tuple) -> bool:
        le = all(
            (a <= b) if sense == "min" else (a >= b)
            for a, b, sense in zip(s, r, senses)
        )
        lt = any(
            (a < b) if sense == "min" else (a > b)
            for a, b, sense in zip(s, r, senses)
        )
        return le and lt

    return {r for r in pts if not any(dominates(s, r) for s in pts if s != r)}

"""Heavy hitters at scale: Misra-Gries candidate pruning + exact confirm.

The naive frequent-items query (``groupBy(col).count().filter(cnt >
phi*n)``) shuffles one (value, count) pair per DISTINCT value — fine
for small domains, a full-vocabulary exchange at 100 TB.  This operator
cuts the shuffle to O(partitions / phi) with the classic two-phase
shape:

1. **Candidate phase** — each partition runs a Misra-Gries summary with
   ``k = ceil(1/phi)`` counters (one Arrow-batched pass, no shuffle).
   MG guarantees any item with partition frequency > n_p/k survives the
   partition's summary; since an item with GLOBAL frequency > phi*n
   must exceed phi*n_p on at least one partition (pigeonhole), the
   union of per-partition candidates is a SUPERSET of the true heavy
   hitters.  At most k candidates per partition leave the scan.
2. **Confirm phase** — candidates (≤ k·partitions values) broadcast
   into a semi-join, and only matching rows are counted exactly.  The
   final counts and the phi threshold are exact integers, so the result
   is IDENTICAL to the naive query — the sketch only prunes, never
   decides.

Same design contract as ``operators/bloomjoin.py``: the approximate
structure is invisible in the results (oracle-checkable against plain
SQL) and only caps the shuffle.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_summary(
    batches: Iterator[pd.DataFrame], col: str, k: int
) -> list[str]:
    """One partition's Misra-Gries pass: fold every Arrow batch through
    k counters and return the surviving keys.  Module-level (not a
    closure) so the superset guarantee is property-testable directly
    against arbitrary partition/batch splits
    (tests/test_exactness_properties.py) — the kernel the distributed
    candidate phase actually runs."""
    counters: dict[str, int] = {}
    for batch in batches:
        for v in batch[col]:
            if v in counters:
                counters[v] += 1
            elif len(counters) < k:
                counters[v] = 1
            else:
                # decrement-all step; drop zeroed counters
                dead = []
                for key in counters:
                    counters[key] -= 1
                    if counters[key] == 0:
                        dead.append(key)
                for key in dead:
                    del counters[key]
    return list(counters.keys())


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries frequent-item candidates.

    Returns a one-column DataFrame (``col``, same string type) holding
    the distinct union of every partition's surviving counter keys —
    a superset of all items with global frequency > n/k.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    schema = f"{col} string"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield pd.DataFrame({col: mg_summary(batches, col, k)})

    return df.select(col).mapInPandas(summarize, schema=schema).distinct()


def heavy_hitters_exact(df: DataFrame, col: str, phi: float) -> DataFrame:
    """All values of ``col`` with frequency > phi * |df|, with EXACT
    counts — result identical to the naive full groupBy, shuffle
    bounded by the candidate set.

    Two scans (count + confirm) plus the candidate pass; at scale the
    total-count scan merges into any upstream statistics collection.
    Output: (``col``, ``freq`` bigint).
    """
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    n = df.count()
    k = math.ceil(1.0 / phi)
    cand = mg_candidates(df, col, k)
    return (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") > F.lit(float(phi)) * F.lit(float(n)))
    )

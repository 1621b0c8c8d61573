"""As-of and range joins — operators Spark lacks natively, composed
from built-ins (preference (a) of the custom-operator ladder; no
Pandas fallback needed).

**As-of join** (for each left row, the latest right row with
``right.ts <= left.ts`` per key): instead of a per-key merge_asof, we
UNION both sides tagged, sort by (key, ts, side-rank) inside a window,
and carry the last-seen right timestamp forward with
``last_value(..., ignorenulls=True)``.  One shuffle on the key — the
same cost as a plain grouped window, no nested-loop anywhere, and it
streams through arbitrarily large sides (classic event-attribution
shape).

**Range join** against a REGULAR banding dimension is not a join at
all: the band is computable per row (``floor((x - lo)/width)``), which
is how it must be done at 100 TB.  ``band_range_join`` provides the
general non-equi form for irregular bands (broadcast the band table);
``regular_band`` provides the arithmetic fast path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row: columns of the latest right row at-or-before
    (``strict``: strictly-before) its timestamp, per key.

    Left rows with no qualifying right row are dropped (inner as-of,
    matching DuckDB's ASOF JOIN).  If the right side has DUPLICATE
    timestamps within a key, which of the tied rows wins is
    unspecified (as in DuckDB) — pre-aggregate the right side to one
    row per (key, ts) when that matters.
    """
    lcols = left.columns
    # side_rank orders right rows before left rows at equal timestamps,
    # so "at-or-before" includes ties; strict mode flips the order.
    right_rank, left_rank = (0, 1) if not strict else (1, 0)
    tagged_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(right_rank).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(left_rank).alias("__side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in right_payload
        ],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    unioned = tagged_r.unionByName(tagged_l)
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in right_payload
        ],
        F.last(
            F.when(F.col("__side") == right_rank, F.col("__ts")), ignorenulls=True
        ).over(w).alias("__asof_ts"),
    )
    out = carried.filter(
        (F.col("__side") == left_rank) & F.col("__asof_ts").isNotNull()
    )
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.col("__asof_ts").alias(f"asof_{right_ts}"),
        *[F.col(f"__asof_{c}").alias(f"asof_{c}") for c in right_payload],
    )


def band_range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """General range join: fact.value ∈ [band.lo, band.hi).  The band
    table must be small (broadcast); Spark plans a broadcast nested
    loop whose inner side is |bands| rows — fine for banding, wrong for
    fact×fact ranges (bucketize those)."""
    return facts.join(
        F.broadcast(bands),
        (facts[value_col] >= bands[lo_col]) & (facts[value_col] < bands[hi_col]),
    )


def regular_band(value: Column, lo: float, width: float) -> Column:
    """Arithmetic fast path for REGULAR bands: the band index is a
    per-row computation — no join, no shuffle, scale-free."""
    return F.floor((value - F.lit(lo)) / F.lit(width)).cast("long")

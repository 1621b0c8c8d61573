"""Bounded-task within-bucket pair generation (triangle-blocked
self-join).

The within-bucket self-join that powers every LSH near-dup pass
(`a.bucket == b.bucket AND a.id < b.id`) has a scale failure mode that
neither AQE skew-join nor plain salting can fix: the shuffle key is the
bucket id, so ONE reducer task receives the whole hottest bucket and
does O(|bucket|²) pair work (measured in scripts/scale_smoke.py — at
30× sf0.1 the skew factor over the uniform-occupancy model was ~25×).
AQE can split a skewed partition between *different* keys, but it
cannot split the rows *of one key* across tasks, and salting one side
of a self-join drops the pairs that straddle salt values.

The fix is the classic triangle/block scheme (the partitioning behind
MapReduce triangle enumeration and DIMSUM-style all-pairs): split each
bucket into B deterministic blocks by id hash, and make the task key
the unordered BLOCK PAIR ``(bucket, b_lo, b_hi)``:

- a row in block ``i`` is replicated to every pair key it can be the
  lower-block member of (``(i, j), j ≥ i``) on the left side and the
  higher-block member of (``(j, i), j ≤ i``) on the right side;
- each task joins only blocks ``b_lo × b_hi`` — at most
  ``2·|bucket|/B`` input rows and ``(|bucket|/B)²`` pair work;
- every unordered pair surfaces exactly once: same-block pairs via the
  ``(i, i)`` key with the id order filter, cross-block pairs via their
  unique ``(min, max)`` block key.

Cost model: shuffle volume grows ×B (each row ships B+1 copies) in
exchange for a B²-way split of the hottest bucket's pair work — choose
``B ≈ ceil(max_bucket / rows_per_task)``.  ``B = 1`` degenerates to
the plain within-bucket join (same plan shape, one replica), so
callers can size B from the bucket histogram and pay nothing when the
data is small or well spread.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default per-block row target: a 4k-row block is ~16M candidate pairs
#: per task at the diagonal — seconds of codegen'd work — while keeping
#: the replication factor B small until a bucket is genuinely huge.
TARGET_BLOCK_ROWS = 4096

#: Replication-factor cap: B=16 multiplies shuffle volume ×17 at most;
#: beyond that, more planes/bands (a better signature) is the right
#: lever, not more blocks.
MAX_BLOCKS = 16


def n_blocks_for(max_bucket_rows: int, target: int = TARGET_BLOCK_ROWS) -> int:
    """Block count for a corpus whose largest bucket has
    ``max_bucket_rows`` rows: ceil(max/target) clamped to [1, MAX_BLOCKS]."""
    if max_bucket_rows <= target:
        return 1
    return min(MAX_BLOCKS, math.ceil(max_bucket_rows / target))


def blocked_self_pairs(
    df: DataFrame,
    bucket_col: str,
    id_col: str,
    n_blocks: int,
    pair_filter: Column | None = None,
) -> DataFrame:
    """All unordered within-bucket pairs of ``df``, one row per pair.

    ``df`` must carry ``bucket_col`` (the grouping key), ``id_col``
    (a unique row id), and any payload columns.  The result carries
    every ``df`` column twice, suffixed ``_a`` / ``_b`` (bucket once,
    as ``bucket_col``), canonically ordered ``id_a < id_b``, and is
    row-identical to the naive
    ``a.join(b, bucket equal & id_a < id_b)`` for every ``n_blocks``
    (asserted in tests/test_scale_ops.py).  ``pair_filter`` (over the
    suffixed columns) is applied before canonicalization so cheap
    predicates prune inside the join; it MUST be symmetric under the
    ``_a``/``_b`` swap (a similarity threshold is; an id-order
    predicate is not — cross-block pairs arrive in block order).
    """
    payload = [c for c in df.columns if c not in (bucket_col, id_col)]
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    t = df.withColumn("__blk", blk)

    # Left role: lower-block member → replicate to (blk, j) for j ≥ blk.
    # Right role: higher-block member → replicate to (i, blk) for i ≤ blk.
    lo_keys = F.sequence(F.col("__blk"), F.lit(n_blocks - 1))
    hi_keys = F.sequence(F.lit(0), F.col("__blk"))
    a = t.select(
        F.col(bucket_col),
        F.col("__blk").alias("__b_lo"),
        F.explode(lo_keys).alias("__b_hi"),
        F.col(id_col).alias(f"{id_col}_a"),
        F.col("__blk").alias("__blk_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload],
    )
    b = t.select(
        F.col(bucket_col).alias("__bucket_b"),
        F.explode(hi_keys).alias("__b_lo_b"),
        F.col("__blk").alias("__b_hi_b"),
        F.col(id_col).alias(f"{id_col}_b"),
        F.col("__blk").alias("__blk_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload],
    )
    # Same-block pairs surface under the diagonal key (i, i) with the id
    # order filter; cross-block pairs under their unique (min, max) key.
    on_diagonal = F.col("__blk_a") == F.col("__blk_b")
    pairs = a.join(
        b,
        (F.col(bucket_col) == F.col("__bucket_b"))
        & (F.col("__b_lo") == F.col("__b_lo_b"))
        & (F.col("__b_hi") == F.col("__b_hi_b"))
        & (
            ~on_diagonal
            | (F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
        ),
    )
    if pair_filter is not None:
        pairs = pairs.filter(pair_filter)

    # Canonicalize id_a < id_b: cross-block pairs arrive in block order,
    # not id order, so swap the _a/_b slots where needed.
    swapped = F.col(f"{id_col}_a") > F.col(f"{id_col}_b")

    def pick(col_a: str, col_b: str) -> tuple[Column, Column]:
        return (
            F.when(swapped, F.col(col_b)).otherwise(F.col(col_a)),
            F.when(swapped, F.col(col_a)).otherwise(F.col(col_b)),
        )

    id_a, id_b = pick(f"{id_col}_a", f"{id_col}_b")
    out = [
        F.col(bucket_col),
        id_a.alias(f"{id_col}_a"),
        id_b.alias(f"{id_col}_b"),
    ]
    for c in payload:
        c_a, c_b = pick(f"{c}_a", f"{c}_b")
        out += [c_a.alias(f"{c}_a"), c_b.alias(f"{c}_b")]
    return pairs.select(*out)

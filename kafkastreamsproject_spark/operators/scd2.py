"""SCD2 (slowly-changing-dimension) upsert — MERGE INTO emulated with
joins + union.

Without a table format that supports MERGE (Delta/Iceberg jars are not
in this environment), the classic emulation is three relational legs
over (snapshot, changes):

1. carried  — snapshot rows whose key has no change (left_anti);
2. closed   — current snapshot rows whose key HAS a change, with
   ``valid_to`` stamped and ``is_current`` cleared;
3. opened   — the change rows as new current versions.

All three legs are joins/projections — at scale the single shuffle is
on the merge key (or zero shuffles if both sides are bucketed on it,
sources/bucketed.py).  With Delta available the same call maps to one
``MERGE INTO ... WHEN MATCHED/NOT MATCHED``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def scd2_apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    change_ts: Column,
) -> DataFrame:
    """Apply ``changes`` to an SCD2 ``snapshot``.

    ``snapshot`` must carry ``valid_from timestamp, valid_to timestamp
    (null = open), is_current boolean`` alongside the dimension columns;
    ``changes`` carries the dimension columns only.  Returns the new
    snapshot (not written — callers choose the sink).

    One version is applied per key per call: if ``changes`` carries
    several rows for a key, only the LATEST by ``change_ts`` survives
    (row_number pre-dedupe below; ties broken by the dimension columns
    for determinism).  Without this, every change row would open as
    current simultaneously and the closed leg would duplicate each
    current row once per matching change.  Multi-step histories are
    applied as successive calls in change_ts order — the same contract
    as Delta's ``MERGE`` (which also rejects multiple source matches).
    """
    dim_cols = [c for c in changes.columns]
    ch = changes.select(
        *dim_cols,
        change_ts.alias("__change_ts"),
    )
    latest = W.partitionBy(key).orderBy(
        F.col("__change_ts").desc(), *[F.col(c).desc() for c in dim_cols]
    )
    ch = (
        ch.withColumn("__rn", F.row_number().over(latest))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    # no .distinct(): the row_number filter above already guarantees one
    # row per key, and the anti/semi joins below are insensitive to
    # build-side multiplicity anyway — a distinct here is a pure extra
    # shuffle
    ch_keys = ch.select(F.col(key).alias("__ck"))

    current = snapshot.filter(F.col("is_current"))
    history = snapshot.filter(~F.col("is_current"))

    carried = current.join(ch_keys, current[key] == ch_keys["__ck"], "left_anti")
    closed = (
        current.join(ch_keys, current[key] == ch_keys["__ck"], "left_semi")
        .join(ch.select(F.col(key).alias("__k2"), "__change_ts"),
              current[key] == F.col("__k2"))
        .withColumn("valid_to", F.col("__change_ts"))
        .withColumn("is_current", F.lit(False))
        .drop("__k2", "__change_ts")
    )
    opened = ch.select(
        *dim_cols,
        F.col("__change_ts").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    cols = snapshot.columns
    return (
        history.select(cols)
        .unionByName(carried.select(cols))
        .unionByName(closed.select(cols))
        .unionByName(opened.select(cols))
    )

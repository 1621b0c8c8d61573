"""CDC → bucketed-store merge fold: the streaming leg of
sources/bucketed.py:merge_upsert_in_store.

A change-data-capture log arrives as micro-batches of (key, payload,
seq, tombstone) events — possibly several events per key per batch,
in no particular order within the batch (the upstream log's partition
interleaving).  Each fold:

1. COMPACTS the batch last-writer-wins: for every key keep the event
   with the highest ``seq_col`` (ties impossible when seq is the
   upstream log offset; a silent tiebreak would make the winning
   payload partition-layout-dependent, so a duplicated (key, seq) is
   raised executor-side as upstream corruption);
2. MERGES the compacted batch into the bucketed store — matched keys
   replaced, unmatched inserted, tombstones deleted, only the buckets
   the batch's keys hash to rewritten.

Ordering contract: batches are applied in arrival order, so the final
store state per key is the payload of the winning event of the LAST
batch that touched the key — (batch, seq) lexicographic order, the
standard CDC-apply semantics.  Cross-batch seq regression is the
upstream's business: a later batch legitimately overwrites a higher
seq from an earlier one (log compaction after a producer retry does
exactly this), so the fold does not enforce monotonicity.

Replay: merging the same compacted batch twice leaves the store
unchanged (pytest-pinned on the merge), so a crash between the merge
and the caller's checkpoint commit is absorbed by re-running the
batch — at-least-once delivery composes to exactly-once store state.

Use with Structured Streaming via ``foreachBatch``:

    q = (events.writeStream.foreachBatch(
            lambda b, _id: cdc_merge_ingest_batch(b, store, ...))
         .option("checkpointLocation", ckpt).start())
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from kafkastreamsproject_spark.sources.bucketed import (
    merge_upsert_in_store,
    store_table_name,
)


def compact_cdc_batch(batch: DataFrame, key_col: str, seq_col: str) -> DataFrame:
    """Last-writer-wins compaction: one row per ``key_col``, the event
    with the highest ``seq_col``.  One per-key window, so the shuffle
    is on the key — the same partitioning the merge's bucket routing
    needs downstream.

    A (key, seq) duplicated AT THE TOP of a key's order would make the
    winner's PAYLOAD arbitrary (row_number's tie order is
    partition-layout-dependent — exactly the nondeterminism this repo
    bans), and with a real log offset as seq it cannot happen — so it
    is treated as upstream corruption and raised executor-side (the
    joins.py assert_true device: ``lead(seq)`` over the SAME window
    spec costs no extra shuffle, and the guard sits in the filter
    predicate where Catalyst cannot prune it).  Ties strictly below
    the winner don't affect the output and are not checked."""
    w = W.partitionBy(key_col).orderBy(F.col(seq_col).desc())
    guard = F.assert_true(
        F.col("__nxt").isNull() | (F.col("__nxt") != F.col(seq_col)),
        F.concat(
            F.lit(f"duplicate ({key_col}, {seq_col}) in CDC batch at key "),
            F.col(key_col).cast("string"),
        ),
    )
    return (
        batch.withColumn("__lww", F.row_number().over(w))
        .withColumn("__nxt", F.lead(seq_col).over(w))
        .filter((F.col("__lww") == 1) & guard.isNull())
        .drop("__lww", "__nxt")
    )


def cdc_merge_ingest_batch(
    batch: DataFrame,
    store_root: str,
    schema: str,
    key_col: str,
    seq_col: str,
    n_buckets: int,
    tombstone_col: str | None = None,
) -> dict[str, int]:
    """Fold one CDC micro-batch into the bucketed store at
    ``{store_root}/rows``: compact last-writer-wins, then bucket-local
    merge.  Returns the merge counts (affected_buckets,
    files_rewritten, rows_updated, rows_inserted, rows_deleted)."""
    spark = batch.sparkSession
    path = f"{store_root}/rows"
    compacted = compact_cdc_batch(batch, key_col, seq_col)
    # parse the DDL properly — a naive comma-split breaks on nested
    # types like decimal(10,2) or map<string,int>
    keep = spark.createDataFrame([], schema).columns
    if tombstone_col is not None:
        keep = keep + [tombstone_col]
    return merge_upsert_in_store(
        spark,
        compacted.select(*keep),
        path,
        store_table_name("cdc_store", path),
        schema,
        [key_col],
        n_buckets,
        tombstone_col=tombstone_col,
    )

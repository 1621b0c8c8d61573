"""CDC → bucketed-store merge fold (streaming/cdcmerge.py): batch
compaction, multi-batch apply order, and corruption guards."""

from __future__ import annotations

import pytest

from kafkastreamsproject_spark.sources.bucketed import (
    read_bucketed_store,
    store_table_name,
)
from kafkastreamsproject_spark.streaming.cdcmerge import (
    cdc_merge_ingest_batch,
    compact_cdc_batch,
)

EV_SCHEMA = "k string, v bigint, seq bigint, deleted boolean"
STORE_SCHEMA = "k string, v bigint"
N_BUCKETS = 8


def _fold(spark, store, batches):
    for rows in batches:
        batch = spark.createDataFrame(rows, EV_SCHEMA)
        cdc_merge_ingest_batch(
            batch, store, STORE_SCHEMA, "k", "seq", N_BUCKETS,
            tombstone_col="deleted",
        )
    path = f"{store}/rows"
    table = store_table_name("cdc_store", path)
    df = read_bucketed_store(
        spark, path, table, STORE_SCHEMA, ["k"], N_BUCKETS
    )
    out = sorted((r.k, r.v) for r in df.collect())
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    return out


def test_compact_keeps_highest_seq(spark):
    batch = spark.createDataFrame(
        [("a", 1, 10, False), ("a", 2, 30, False), ("a", 3, 20, False),
         ("b", 9, 5, False)],
        EV_SCHEMA,
    )
    got = sorted(
        (r.k, r.v, r.seq)
        for r in compact_cdc_batch(batch, "k", "seq").collect()
    )
    assert got == [("a", 2, 30), ("b", 9, 5)]


def test_compact_raises_on_duplicate_key_seq(spark):
    batch = spark.createDataFrame(
        [("a", 1, 10, False), ("a", 2, 10, False)], EV_SCHEMA
    )
    with pytest.raises(Exception, match="duplicate"):
        compact_cdc_batch(batch, "k", "seq").collect()


def test_multi_batch_apply_order_wins_over_seq(spark, tmp_path):
    """A later BATCH overwrites an earlier batch's higher seq (log
    compaction after a producer retry does this); within a batch the
    highest seq wins; a tombstone winner deletes; a later batch
    re-inserts a deleted key."""
    store = str(tmp_path / "cdc1")
    final = _fold(
        spark,
        store,
        [
            # batch 0: inserts
            [("a", 1, 100, False), ("b", 2, 101, False),
             ("c", 3, 102, False), ("d", 4, 103, False)],
            # batch 1: update a (intra-batch LWW), delete b,
            #          lower-seq overwrite of c
            [("a", 10, 200, False), ("a", 11, 201, False),
             ("b", None, 202, True), ("c", 30, 50, False)],
            # batch 2: re-insert b, delete d, leave a/c alone
            [("b", 20, 300, False), ("d", None, 301, True)],
        ],
    )
    assert final == [("a", 11), ("b", 20), ("c", 30)]


def test_replaying_last_batch_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "cdc2")
    b0 = [("x", 1, 1, False), ("y", 2, 2, False)]
    b1 = [("x", 10, 3, False), ("y", None, 4, True), ("z", 5, 5, False)]
    final = _fold(spark, store, [b0, b1])
    replayed = _fold(spark, store, [b1])  # crash-replay of the last batch
    assert final == replayed == [("x", 10), ("z", 5)]

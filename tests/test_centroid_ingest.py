"""Incremental centroid-store fold (streaming/centroids.py): epoch
replay idempotency and snapshot isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamsproject_spark.sources.testdata import load_table
from kafkastreamsproject_spark.streaming.centroids import (
    centroid_ingest_batch,
    quantize_codes,
    read_centroid_store,
)


def _rows(df):
    return sorted(
        (r.cid, r.n_assigned, r.n_total, r.c_dot)
        for r in df.select("cid", "n_assigned", "n_total", "c_dot").collect()
    )


def test_epoch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running a crashed epoch must rebuild the SAME snapshot and
    summary: the fold reads only epoch t-1's (unchanged) snapshot, so
    replay is structurally deterministic — the at-least-once
    foreachBatch contract the snapshot-per-epoch layout exists for."""
    store = str(tmp_path / "cstore")
    q = quantize_codes(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "qv"
    )
    b1 = q.filter(F.col("vec_id") % 2 == 0)
    b2 = q.filter(F.col("vec_id") % 2 == 1)

    centroid_ingest_batch(b1, store, epoch=0).collect()
    first = _rows(centroid_ingest_batch(b2, store, epoch=1))
    snap1 = sorted(
        (r.cid, r.n, tuple(r.s), tuple(r.cv))
        for r in read_centroid_store(spark, store, 2).collect()
    )
    # crash-replay epoch 1
    replay = _rows(centroid_ingest_batch(b2, store, epoch=1))
    snap2 = sorted(
        (r.cid, r.n, tuple(r.s), tuple(r.cv))
        for r in read_centroid_store(spark, store, 2).collect()
    )
    assert first == replay
    assert snap1 == snap2


def test_counts_conserve_rows(spark, sf_dir, tmp_path):
    """Every batch row lands in exactly one centroid: per-epoch
    n_assigned sums to the batch size, cumulative totals to the corpus
    prefix."""
    store = str(tmp_path / "cstore")
    q = quantize_codes(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", "qv"
    )
    b1 = q.filter(F.col("vec_id") % 2 == 0)
    b2 = q.filter(F.col("vec_id") % 2 == 1)
    s1 = centroid_ingest_batch(b1, store, epoch=0)
    assert s1.agg(F.sum("n_assigned")).first()[0] == b1.count()
    s2 = centroid_ingest_batch(b2, store, epoch=1)
    assert s2.agg(F.sum("n_assigned")).first()[0] == b2.count()
    assert s2.agg(F.sum("n_total")).first()[0] == q.count()

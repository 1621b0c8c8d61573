"""Incremental IVF-PQ index (streaming/annindex.py): replay
idempotency, duplicate-vector drops, cross-epoch growth, compaction
safety, and the store plan shapes.  Exact agreement with the batch
ivf_pq_search runs in tests/test_shadow_queries.py
(streaming_ann_index reuses its DuckDB oracle verbatim)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from kafkastreamsproject_spark.streaming.annindex import (
    ann_ingest_batch,
    ann_query_index,
    compact_codes,
    create_ann_store,
    read_codes,
    read_seen,
)


def _emb(spark, lo, hi, dim=8):
    rows = [
        (int(v), [((v * 7 + i) % 13) / 13.0 for i in range(dim)])
        for v in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _res(df):
    return {(r.query_id, r.rnk): (r.vec_id, r.adc_dist2) for r in df.collect()}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _fresh_store(spark, tmp_path, name):
    store = str(tmp_path / name)
    # codebooks freeze from the first 16 vectors (the family
    # convention); later folds only APPEND codes under them
    create_ann_store(spark, store, _emb(spark, 0, 40))
    return store


def test_replay_and_duplicates_are_dropped(spark, tmp_path):
    store = _fresh_store(spark, tmp_path, "replay")
    first = ann_ingest_batch(_emb(spark, 0, 20), store)
    assert first["vecs_indexed"] == 20
    assert first["codes_appended"] == 80  # 4 subspaces per vector
    second = ann_ingest_batch(_emb(spark, 20, 40), store)
    assert second["vecs_indexed"] == 20
    before = _res(ann_query_index(spark, store, _emb(spark, 0, 3)))
    # full-batch replay AND a partial re-delivery: both no-ops
    assert ann_ingest_batch(_emb(spark, 20, 40), store) == {
        "vecs_indexed": 0, "codes_appended": 0,
    }
    assert ann_ingest_batch(_emb(spark, 10, 30), store) == {
        "vecs_indexed": 0, "codes_appended": 0,
    }
    assert _res(ann_query_index(spark, store, _emb(spark, 0, 3))) == before
    assert read_seen(spark, store).count() == 40


def test_index_grows_across_epochs(spark, tmp_path):
    """Vectors folded in epoch 0 stay searchable after epoch 1, and
    new vectors become candidates — the running index serves at every
    point without any rebuild."""
    store = _fresh_store(spark, tmp_path, "grow")
    ann_ingest_batch(_emb(spark, 0, 20), store)
    e0 = _res(ann_query_index(spark, store, _emb(spark, 0, 3)))
    found0 = {v for (v, _d) in e0.values()}
    assert found0 and all(v < 20 for v in found0)
    ann_ingest_batch(_emb(spark, 20, 40), store)
    e1 = _res(ann_query_index(spark, store, _emb(spark, 0, 3)))
    found1 = {v for (v, _d) in e1.values()}
    assert any(v >= 20 for v in found1)
    assert len(e1) >= len(e0)


def test_compaction_preserves_results(spark, tmp_path):
    store = _fresh_store(spark, tmp_path, "compact")
    ann_ingest_batch(_emb(spark, 0, 20), store)
    ann_ingest_batch(_emb(spark, 20, 40), store)
    before = _res(ann_query_index(spark, store, _emb(spark, 0, 3)))
    assert compact_codes(spark, store) > 0
    assert _res(ann_query_index(spark, store, _emb(spark, 0, 3))) == before


def test_store_plan_shapes(spark, tmp_path):
    """(a) ingest-side seen probe: bucket-key anti-join, store scans
    its buckets in place; (b) query-side candidate join: the probes
    broadcast against the cell-bucketed codes store — no Exchange
    anywhere on the store path."""
    from kafkastreamsproject_spark.sources.bucketed import (
        shuffle_scoped_to_buckets,
    )
    from kafkastreamsproject_spark.streaming.annindex import N_BUCKETS

    store = _fresh_store(spark, tmp_path, "plan")
    ann_ingest_batch(_emb(spark, 0, 20), store)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = _emb(spark, 20, 40).join(
            read_seen(spark, store).select("vec_id"), "vec_id", "left_anti"
        )
        with shuffle_scoped_to_buckets(spark, N_BUCKETS):
            j_plan = _plan(probe)
        assert "Bucketed: true" in j_plan, j_plan
        assert len(re.findall(r"\(\d+\) Exchange", j_plan)) <= 1, j_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    probes = spark.createDataFrame(
        [(0, 1), (0, 2)], "query_id long, cell int"
    )
    cand = F.broadcast(probes).join(read_codes(spark, store), "cell")
    c_plan = _plan(cand)
    assert "BroadcastHashJoin" in c_plan, c_plan
    assert len(re.findall(r"\(\d+\) Exchange", c_plan)) == 0, c_plan


def test_forget_vectors_is_exact_and_reindexable(spark, tmp_path):
    """Vector erasure: after forgetting, queries equal a fresh index
    built from the survivors; replay is a no-op; the erased id is
    re-indexable."""
    from kafkastreamsproject_spark.streaming.annindex import (
        forget_vectors_in_index,
    )

    store = _fresh_store(spark, tmp_path, "forget")
    ann_ingest_batch(_emb(spark, 0, 40), store)
    victims = spark.createDataFrame([(25,), (33,)], "vec_id long")
    res = forget_vectors_in_index(spark, victims, store)
    assert res["codes"]["rows_deleted"] == 8  # 2 vectors x 4 subspaces
    assert res["seen"]["rows_deleted"] == 2

    fresh = str(tmp_path / "survivors")
    create_ann_store(spark, fresh, _emb(spark, 0, 40))
    ann_ingest_batch(
        _emb(spark, 0, 40).filter(~F.col("vec_id").isin([25, 33])), fresh
    )
    q = _emb(spark, 0, 3)
    assert _res(ann_query_index(spark, store, q)) == _res(
        ann_query_index(spark, fresh, q)
    )

    replay = forget_vectors_in_index(spark, victims, store)
    assert replay["codes"]["rows_deleted"] == 0
    assert replay["seen"]["rows_deleted"] == 0

    back = ann_ingest_batch(
        _emb(spark, 0, 40).filter(F.col("vec_id") == 25), store
    )
    assert back["vecs_indexed"] == 1

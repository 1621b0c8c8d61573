"""Unit pins for plans/llmdata.py beyond the oracle compare: the
session-window gap-boundary semantics the oracle SQL assumes, and the
determinism contract of mixture sampling."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 3, 1, 8, minute)


def test_session_window_gap_boundary_merges(spark):
    """Spark session-window merge semantics, pinned empirically: an
    event at EXACTLY last+gap JOINS the session (touching windows
    merge); only a strictly larger gap starts a new one.  The DuckDB
    oracle for session_window_stats therefore breaks islands on a
    STRICT `>` — if Spark ever changed to exclusive ends, this pin
    fails before the oracle compare gets a chance to."""
    rows = [
        (1, _ts(0)),   # session A
        (1, _ts(29)),  # A (gap 29 < 30)
        (1, _ts(59)),  # STILL A: gap from 08:29 is exactly 30 min (touching)
        (2, _ts(0)),   # other user: own session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("s"), F.col("sw.end").alias("e"),
                "n_events")
        .orderBy("user_id", "s")
        .collect()
    )
    assert [(r.user_id, r.n_events) for r in out] == [(1, 3), (2, 1)]
    # window end extends gap past the LAST event of the merged session
    assert out[0].s == _ts(0) and out[0].e == dt.datetime(2024, 3, 1, 9, 29)
    # one minute past the boundary DOES split
    df2 = spark.createDataFrame(
        [(1, _ts(0)), (1, dt.datetime(2024, 3, 1, 8, 31))],
        "user_id long, ts timestamp",
    )
    n = (
        df2.groupBy(F.session_window("ts", "30 minutes"))
        .count()
        .count()
    )
    assert n == 2


def test_mixture_sample_is_partitioning_invariant(spark, sf_dir):
    """The mixture filter is a pure function of (doc_id, source): the
    selected row set must not change under repartitioning — the property
    that makes the sample reproducible on a re-sharded 100 TB corpus."""
    from kafkastreamsproject_spark.plans.registry import shadow_queries

    spec = shadow_queries()["mixture_sample"]
    a = {r.doc_id for r in spec.spark(spark, sf_dir).collect()}
    b = {
        r.doc_id
        for r in spec.spark(spark, sf_dir).repartition(13).collect()
    }
    assert a == b and a


def test_contamination_eval_docs_fully_contaminate_themselves(spark, sf_dir):
    """Sanity of the overlap direction: a TRAINING doc that also exists
    verbatim in the eval slice would score rate 1.0; eval docs never
    appear in the output (they are the reference set, not the audited
    set)."""
    from kafkastreamsproject_spark.plans.llmdata import (
        _EVAL_MOD,
        contamination_ngram_overlap,
    )

    out = contamination_ngram_overlap(spark, sf_dir)
    assert out.filter(F.col("doc_id") % _EVAL_MOD == 0).count() == 0
    bad = out.filter(
        (F.col("contamination_rate") < 0) | (F.col("contamination_rate") > 1)
    ).count()
    assert bad == 0


def test_int8_quantization_error_bound(spark, sf_dir):
    """Dequantization error bound: |x − q·max_abs/127| ≤ max_abs/254
    (half a quantization step) for every component — the contract that
    makes the int8 corpus usable for retrieval."""
    from kafkastreamsproject_spark.plans.registry import shadow_queries
    from kafkastreamsproject_spark.sources.testdata import load_table

    q = shadow_queries()["embedding_quantize_int8"].spark(spark, sf_dir)
    emb = {r.vec_id: r.embedding for r in
           load_table(spark, "embeddings", sf_dir).collect()}
    for r in q.limit(100).collect():
        codes = [int(c) for c in r.q_csv.split(",")]
        x = emb[r.vec_id]
        assert len(codes) == len(x) == r.n_dim
        assert max(abs(c) for c in codes) <= 127
        # recover max_abs exactly enough from the rounded emission
        max_abs = max(abs(float(v)) for v in x)
        step = max_abs / 127.0
        for c, v in zip(codes, x):
            assert abs(float(v) - c * step) <= step / 2 + 1e-9, (r.vec_id, c, v)


def test_semantic_dedup_keep_one_per_cluster(spark, sf_dir):
    """Keep-one invariants the oracle compare can't state directly:
    exactly one kept doc per cluster, the kept doc IS the cluster's min
    id, every corpus doc gets exactly one verdict row, and the removal
    accounting reconciles (non-kept rows == sum of (cluster_size-1))."""
    from kafkastreamsproject_spark.plans.llmdata import semantic_dedup_keep
    from kafkastreamsproject_spark.sources.testdata import load_table

    out = semantic_dedup_keep(spark, sf_dir).collect()
    n_docs = load_table(spark, "documents", sf_dir).count()
    assert len(out) == n_docs
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    removed = 0
    for cid, rows in by_cluster.items():
        kept = [r for r in rows if r.kept]
        assert len(kept) == 1 and kept[0].doc_id == cid == min(r.doc_id for r in rows)
        assert all(r.cluster_size == len(rows) for r in rows)
        removed += len(rows) - 1
    assert removed == sum(1 for r in out if not r.kept)
    # when the fusion graph has confirmed pairs, some doc must be dropped
    # (at sf0.001 the corpus can legitimately have zero confirmed pairs)
    from kafkastreamsproject_spark.plans.llmdata import hybrid_neardup_fusion

    n_conf = (
        hybrid_neardup_fusion(spark, sf_dir).filter(F.col("text_confirmed")).count()
    )
    assert (n_conf > 0) == any(not r.kept for r in out)


def test_streaming_queries_leave_no_tmp_residue(spark, sf_dir):
    """Every scratch dir a registry query creates (checkpoints, JSONL
    round-trip targets, signature stores) must be cleaned on exit —
    repeated runs may not accumulate tmp residue (r7 verdict item:
    'one test asserts no ckpt_* residue')."""
    import tempfile
    from pathlib import Path

    from kafkastreamsproject_spark.plans.registry import shadow_queries

    prefixes = (
        "ckpt_",
        "neardup_ingest_store_",
        "inc_shard_store_",
        "jsonl_rt_",
        "ksp_ckpt_",
    )
    tmp = Path(tempfile.gettempdir())

    def residue() -> set:
        return {
            p.name
            for p in tmp.iterdir()
            if any(p.name.startswith(x) for x in prefixes)
        }

    before = residue()
    sh = shadow_queries()
    for name in ("streaming_contamination_gate", "streaming_session_windows"):
        sh[name].spark(spark, sf_dir).collect()
    assert residue() == before

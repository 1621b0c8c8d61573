"""The BNLJ sanction list is machine-checkable (VERDICT r10 #3):
testing/bnljbounds.py verifies each sanctioned query's BroadcastNested-
LoopJoin build sides against a declared bound kind, and a deliberately
mis-sanctioned query — a raw scaling-table broadcast — must FAIL every
kind, so the list can't silently absorb an unbounded case."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafkastreamsproject_spark.sources.testdata import load_table
from kafkastreamsproject_spark.testing.bnljbounds import (
    bnlj_bound_violations,
    bnlj_build_sides,
)


def test_raw_scaling_broadcast_fails_every_kind(spark, sf_dir):
    """The mis-sanction case: broadcast the ENTIRE documents table
    (no aggregate, no limit, no selective filter) against another
    corpus scan on a non-equi condition.  No declared kind may pass —
    this is exactly the plan the prose list could have absorbed."""
    docs = load_table(spark, "documents", sf_dir)
    probe = docs.select(F.col("doc_id").alias("p_id"), F.length("text").alias("p_len"))
    bad = probe.join(
        F.broadcast(docs.select("doc_id", F.length("text").alias("len"))),
        F.col("p_len") < F.col("len"),
    )
    sides = bnlj_build_sides(bad)
    assert sides, "expected a BroadcastNestedLoopJoin in the bad plan"
    for kind in ("dim", "agg", "filtered"):
        violations = bnlj_bound_violations(bad, kind)
        assert violations, f"kind {kind!r} wrongly sanctioned a raw broadcast"
        assert "documents" in violations[0]


def test_agg_bounded_broadcast_passes_agg_not_dim(spark, sf_dir):
    """A 1-row aggregate broadcast (the dominant sanctioned shape)
    passes 'agg' and 'filtered' but not 'dim' (the build side does
    scan a scaling table — below the aggregate)."""
    docs = load_table(spark, "documents", sf_dir)
    total = docs.agg(F.count(F.lit(1)).alias("n"))
    q = docs.join(F.broadcast(total), F.col("doc_id") < F.col("n"))
    assert bnlj_build_sides(q), "expected a BNLJ"
    assert bnlj_bound_violations(q, "agg") == []
    assert bnlj_bound_violations(q, "filtered") == []
    assert bnlj_bound_violations(q, "dim")


def test_filtered_broadcast_passes_filtered_not_agg(spark, sf_dir):
    """The bounded-query-set shape: a selective filter (vec_id < 5)
    bounds the broadcast side.  Passes 'filtered'; fails 'agg' (no
    aggregate or limit on the path)."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id")
    )
    q = emb.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
    assert bnlj_build_sides(q), "expected a BNLJ"
    assert bnlj_bound_violations(q, "filtered") == []
    assert bnlj_bound_violations(q, "agg")


def test_filter_above_cache_boundary_counts_as_filtered(spark, sf_dir):
    """The IVF/PQ-family shape: the corpus is persisted once and the
    bounding filter is applied ABOVE the cache, so the pushdown never
    reaches the parquet scan — the checker must see the FilterExec on
    the path through the InMemoryTableScan."""
    emb = load_table(spark, "embeddings", sf_dir).select("vec_id").persist()
    try:
        emb.count()
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id")
        )
        q = emb.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id"))
        assert bnlj_build_sides(q), "expected a BNLJ"
        assert bnlj_bound_violations(q, "filtered") == []
        # flipping the hint broadcasts the RAW cached corpus: the walk
        # must see through the cache and reject it under every kind
        flipped = queries.join(
            F.broadcast(emb), F.col("vec_id") != F.col("q_id")
        )
        assert bnlj_bound_violations(flipped, "filtered")
    finally:
        emb.unpersist()


def test_dim_broadcast_passes_dim(spark):
    """A literal dimension broadcast scans no scaling table: 'dim'."""
    from pyspark.sql import Row

    dim = spark.createDataFrame(
        [Row(lo=0, hi=10, band="a"), Row(lo=10, hi=100, band="b")]
    )
    base = spark.range(1000).select(F.col("id").cast("long"))
    q = base.join(
        F.broadcast(dim),
        (F.col("id") >= F.col("lo")) & (F.col("id") < F.col("hi")),
    )
    assert bnlj_build_sides(q), "expected a BNLJ"
    assert bnlj_bound_violations(q, "dim") == []


def test_unknown_kind_rejected(spark):
    with pytest.raises(ValueError, match="unknown BNLJ bound kind"):
        bnlj_bound_violations(spark.range(1), "prose")


def test_sanctioned_kinds_hold_for_representative_queries(spark, sf_dir):
    """One sanctioned query per kind, checked end-to-end through the
    registry (the full 48-entry sweep runs in scripts/explain_audit.py,
    which gates PLANS.md regeneration)."""
    from kafkastreamsproject_spark.plans.registry import (
        all_queries,
        shadow_queries,
    )
    from scripts.explain_audit import SANCTIONED_BNLJ

    specs = {**all_queries(), **shadow_queries()}
    for name in ("quantity_band_join", "tfidf_top_terms", "ann_topk_cosine",
                 "ivf_pq_search"):
        kind = SANCTIONED_BNLJ[name]
        df = specs[name].spark(spark, sf_dir)
        assert bnlj_bound_violations(df, kind) == [], (name, kind)

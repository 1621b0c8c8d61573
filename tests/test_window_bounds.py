"""The unpartitioned-Window allowlist is machine-checkable (VERDICT
r11 #6 — the same upgrade the BNLJ sanctions got in r11):
testing/planaudit.py:global_window_bound_violations verifies each
allowlisted query's global Windows against a declared bound kind
("agg" = every scaling scan sits below an aggregate/limit, "dim" = no
scaling scan at all), and a deliberately mis-allowlisted query — a
global window directly over a corpus scan — must FAIL every kind, so
the list can't silently absorb a single-task corpus sort."""

from __future__ import annotations

import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafkastreamsproject_spark.sources.testdata import load_table
from kafkastreamsproject_spark.testing.planaudit import (
    ALLOWED_UNBOUNDED_GLOBAL_WINDOW,
    global_window_bound_violations,
    global_window_findings,
)


def test_raw_corpus_global_window_fails_every_kind(spark, sf_dir):
    """The mis-allowlist case: rank the ENTIRE documents table in one
    global window (no aggregate below it) — every input row moves to
    one task.  No declared kind may pass; this is exactly the plan a
    bare name list could have absorbed."""
    docs = load_table(spark, "documents", sf_dir)
    bad = docs.select(
        "doc_id", F.row_number().over(W.orderBy("doc_id")).alias("rk")
    )
    assert "unbounded" in global_window_findings(bad)
    for kind in ("dim", "agg"):
        violations = global_window_bound_violations(bad, kind)
        assert violations, f"kind {kind!r} wrongly sanctioned a corpus sort"
        assert "documents" in violations[0]


def test_agg_bounded_global_window_passes_agg_not_dim(spark, sf_dir):
    """The dominant allowlisted shape: a global window over a
    per-source aggregate.  |sources| rows reach the single task —
    passes 'agg'; fails 'dim' (a scaling table IS scanned, below the
    aggregate)."""
    docs = load_table(spark, "documents", sf_dir)
    per_source = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    q = per_source.select(
        "source", (F.col("n") / F.sum("n").over(W.partitionBy())).alias("share")
    )
    assert global_window_bound_violations(q, "agg") == []
    assert global_window_bound_violations(q, "dim")


def test_dim_global_window_passes_dim(spark, sf_dir):
    """A global window over a dimension table (region: 5 rows by
    construction) passes 'dim' — and therefore 'agg' too."""
    region = load_table(spark, "region", sf_dir)
    q = region.select(
        "r_name", F.row_number().over(W.orderBy("r_regionkey")).alias("rk")
    )
    assert global_window_bound_violations(q, "dim") == []
    assert global_window_bound_violations(q, "agg") == []


def test_unknown_kind_rejected(spark, sf_dir):
    region = load_table(spark, "region", sf_dir)
    q = region.select(F.row_number().over(W.orderBy("r_regionkey")).alias("rk"))
    with pytest.raises(ValueError, match="unknown window bound kind"):
        global_window_bound_violations(q, "filtered")


def test_allowlist_entries_declare_valid_kinds():
    """Every allowlist entry carries a (kind, reason) pair with a
    known kind — the per-plan verification lives in test_plans.py /
    test_shadow_queries.py, which run each allowlisted query and
    assert zero violations for its declared kind."""
    for name, entry in ALLOWED_UNBOUNDED_GLOBAL_WINDOW.items():
        assert isinstance(entry, tuple) and len(entry) == 2, name
        kind, reason = entry
        assert kind in ("dim", "agg"), name
        assert reason, name

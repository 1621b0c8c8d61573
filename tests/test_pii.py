"""PII detect/scrub invariants beyond the shadow-tier oracle compare
(tests/test_shadow_queries.py already value-checks all three queries
against DuckDB; these pin the properties the oracle can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamsproject_spark.plans.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    _pii_corpus,
    pii_detect_stats,
    pii_scrub,
    scrub_text,
)
from kafkastreamsproject_spark.sources.testdata import load_table


def test_base_corpus_is_pii_free(spark, sf_dir):
    """The planting construction assumes the synthetic corpus contains
    no digits or '@' — if the generator ever changes, the modular-count
    expectations below (and the module docstring's claim) break HERE,
    not as a mysterious oracle mismatch."""
    docs = load_table(spark, "documents", sf_dir)
    dirty = docs.filter(F.col("text").rlike("[0-9@]")).count()
    assert dirty == 0


def test_detect_counts_follow_plant_arithmetic(spark, sf_dir):
    """n_email = [3|id] + [6|id], n_phone = [4|id], n_ipv4 = [5|id] —
    the detector recovers exactly what the construction planted, for
    every document."""
    rows = pii_detect_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        d = r.doc_id
        assert r.n_email == (d % 3 == 0) + (d % 6 == 0), d
        assert r.n_phone == int(d % 4 == 0), d
        assert r.n_ipv4 == int(d % 5 == 0), d
        assert r.n_pii == r.n_email + r.n_phone + r.n_ipv4, d


def test_scrub_is_complete_and_flagged(spark, sf_dir):
    """After scrubbing, no PII pattern matches anything; `changed`
    agrees with n_redactions > 0."""
    c = _pii_corpus(spark, sf_dir)
    scrubbed = c.select("doc_id", scrub_text(F.col("text")).alias("text"))
    residue = scrubbed.filter(
        F.col("text").rlike(EMAIL_RE)
        | F.col("text").rlike(PHONE_RE)
        | F.col("text").rlike(IPV4_RE)
    ).count()
    assert residue == 0
    bad_flag = (
        pii_scrub(spark, sf_dir)
        .filter(
            (F.col("changed") == 1) != (F.col("n_redactions") > 0)
        )
        .count()
    )
    assert bad_flag == 0

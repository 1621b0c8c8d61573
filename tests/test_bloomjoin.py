"""Bloom semi-join invariants (the shadow-tier oracle compare in
tests/test_shadow_queries.py value-checks the registered query; these
pin the operator-level properties the aggregate compare can't see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamsproject_spark.operators.bloomjoin import (
    bloom_filter_table,
    bloom_semi_join,
)
from kafkastreamsproject_spark.sources.testdata import load_table


def _sides(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber"
    )
    urgent = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return li, urgent


def test_prefilter_has_no_false_negatives(spark, sf_dir):
    """Every true semi-join row survives the bloom stage even without
    the confirm join — the defining Bloom property."""
    li, urgent = _sides(spark, sf_dir)
    exact = li.join(
        urgent, li["l_orderkey"] == urgent["o_orderkey"], "left_semi"
    )
    bloom_only = bloom_semi_join(
        li, "l_orderkey", urgent, "o_orderkey", exact_confirm=False
    )
    dropped = exact.exceptAll(bloom_only).count()
    assert dropped == 0


def test_confirmed_join_equals_exact_semi_join(spark, sf_dir):
    li, urgent = _sides(spark, sf_dir)
    exact = li.join(
        urgent, li["l_orderkey"] == urgent["o_orderkey"], "left_semi"
    )
    confirmed = bloom_semi_join(li, "l_orderkey", urgent, "o_orderkey")
    assert confirmed.exceptAll(exact).count() == 0
    assert exact.exceptAll(confirmed).count() == 0


def test_tiny_filter_saturates_but_stays_correct(spark, sf_dir):
    """An undersized sketch (64 bits) saturates — the pre-filter passes
    nearly everything — but the confirm join still yields the exact
    result: sizing is a performance knob, never a correctness one."""
    li, urgent = _sides(spark, sf_dir)
    exact_n = li.join(
        urgent, li["l_orderkey"] == urgent["o_orderkey"], "left_semi"
    ).count()
    confirmed_n = bloom_semi_join(
        li, "l_orderkey", urgent, "o_orderkey", n_bits=64
    ).count()
    assert confirmed_n == exact_n


def test_sketch_size_is_capped(spark, sf_dir):
    _, urgent = _sides(spark, sf_dir)
    n_build = urgent.count()
    for n_bits in (1 << 20, 256):
        n_pos = bloom_filter_table(urgent, "o_orderkey", 2, n_bits).count()
        assert n_pos <= min(2 * n_build, n_bits)

"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This mirrors the driver's CORRECTNESS gate (row count + schema +
order-insensitive canonical values) so regressions surface locally first.
"""

from __future__ import annotations

import pytest

from kafkastreamsproject_spark.plans.registry import all_queries
from kafkastreamsproject_spark.testing.compare import run_compare

_SPECS = all_queries()
_WITH_ORACLE = sorted(n for n, s in _SPECS.items() if s.oracle is not None)
_WITHOUT_ORACLE = sorted(n for n, s in _SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    run_compare(spark, _SPECS[name], sf_dir)


@pytest.mark.parametrize("name", _WITHOUT_ORACLE)
def test_query_runs(spark, sf_dir, name):
    """Queries without an oracle still must run and return a stable schema."""
    df = _SPECS[name].spark(spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0

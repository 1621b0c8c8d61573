"""Fixture-drift guard (VERDICT r4 next-round #6).

The driver regenerates /root/testdata per round, and its parquet
physical types have shifted three times (r1 array-hash, r2
media_features, r4 TIMESTAMP_NTZ) — each time silently breaking
queries that assumed the previous vintage.  These tests fail loudly the
moment the on-disk format drifts from what the engine absorbs, at every
scale factor the driver uses, before any oracle row can go red.
"""

from __future__ import annotations

import os

import pytest

from kafkastreamsproject_spark.schemas import TESTDATA_TABLES
from kafkastreamsproject_spark.sources.testdata import load_table

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_reads_as_zoned_timestamp(spark, sf_dir):
    """Whatever parquet vintage is on disk (TIMESTAMP(NANOS)-as-long,
    timestamp[us] NTZ, or zoned), load_table must hand downstream plans a
    plain zoned ``timestamp`` — the type every unix_millis/unix_micros/
    window expression in the engine requires."""
    dtypes = dict(load_table(spark, "events", sf_dir).dtypes)
    assert dtypes["ts"] == "timestamp", dtypes["ts"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_all_tables_load_and_project(spark, sf_dir):
    """Every fixture table must at least load + project one row's schema
    without AnalysisException under the current on-disk format."""
    for name in TESTDATA_TABLES:
        df = load_table(spark, name, sf_dir)
        assert len(df.schema.fields) > 0, name


def test_bench_query_list_builds_against_live_fixtures(spark):
    """Every bench.py headline query must BUILD (analyze) against the
    live fixtures — r4's bench crashed on an AnalysisException raised at
    plan-build time, losing the round's whole perf record.  Building the
    plan and touching .schema forces full analysis without execution
    cost."""
    import bench
    from kafkastreamsproject_spark.plans.registry import all_queries

    specs = all_queries()
    sf_dir = SF_DIRS[0]
    missing = [n for n in bench.BENCH_QUERIES if n not in specs]
    assert not missing, f"bench queries not registered: {missing}"
    for name in bench.BENCH_QUERIES:
        df = specs[name].spark(spark, sf_dir)
        assert df.schema is not None, name

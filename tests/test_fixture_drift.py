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

    if not SF_DIRS:
        pytest.skip("no /root/testdata fixture directories on this machine")
    specs = all_queries()
    sf_dir = SF_DIRS[0]
    missing = [n for n in bench.BENCH_QUERIES if n not in specs]
    assert not missing, f"bench queries not registered: {missing}"
    for name in bench.BENCH_QUERIES:
        df = specs[name].spark(spark, sf_dir)
        assert df.schema is not None, name


# The engine-facing schema of every fixture table AFTER load_table's
# normalization (timestamps zoned, nothing else touched).  A renamed or
# retyped column in a regenerated fixture fails here with a readable
# diff instead of as a cryptic AnalysisException inside some query.
EXPECTED_DTYPES = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"), ("c_name", "string"), ("c_nationkey", "int"),
        ("c_acctbal", "double"), ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"), ("s_name", "string"), ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"), ("p_name", "string"), ("p_brand", "string"),
        ("p_type", "string"), ("p_size", "int"), ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"), ("o_custkey", "bigint"),
        ("o_orderstatus", "string"), ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"), ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"), ("l_partkey", "bigint"), ("l_suppkey", "bigint"),
        ("l_linenumber", "int"), ("l_quantity", "double"),
        ("l_extendedprice", "double"), ("l_discount", "double"), ("l_tax", "double"),
        ("l_returnflag", "string"), ("l_linestatus", "string"),
        ("l_shipdate", "timestamp"),
    ],
    "events": [
        ("event_id", "bigint"), ("ts", "timestamp"), ("user_id", "bigint"),
        ("event_type", "string"), ("value", "double"), ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
        ("source", "string"), ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"), ("embedding", "array<float>"), ("label", "int"),
    ],
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", sorted(EXPECTED_DTYPES))
def test_table_schema_pinned(spark, sf_dir, name):
    assert load_table(spark, name, sf_dir).dtypes == EXPECTED_DTYPES[name]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_text_is_ascii(spark, sf_dir):
    """Charset pin (ADVICE r5): the media_features oracle equates bytes
    with characters (strlen for n_bytes, ord(ch)%16 per byte), which is
    only valid while documents.text is pure ASCII.  The schema pins above
    can't catch a charset drift — this does, before any oracle compare:
    octet_length == char length for every document."""
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", sf_dir)
    n_multibyte = docs.filter(
        F.octet_length("text") != F.length("text")
    ).count()
    assert n_multibyte == 0, (
        f"{n_multibyte} non-ASCII documents in {sf_dir} — media_features "
        "oracle byte/char equivalence no longer holds"
    )

"""UDF-surface tests (SURVEY §2.6 tiers 3–5): the pandas UDF matches the
JVM expression, grouped-map normalizes per group, the UDTF fans out
chunk rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafkastreamsproject_spark.functions import text as TX
from kafkastreamsproject_spark.functions.udfs import (
    ChunkDocument,
    quality_score_pandas,
    zscore_per_group,
)
from kafkastreamsproject_spark.sources.testdata import load_table


def test_pandas_udf_matches_jvm_expression(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(100)
    both = docs.select(
        TX.quality_score(F.col("text")).alias("jvm"),
        quality_score_pandas(F.col("text")).alias("py"),
    ).collect()
    for r in both:
        assert r.jvm == pytest.approx(r.py, abs=1e-9)


def test_zscore_grouped_map(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "value")
    out = zscore_per_group(ev, "event_type", "value")
    stats = out.groupBy("event_type").agg(
        F.avg("zscore").alias("m"), F.stddev_pop("zscore").alias("s")
    )
    for r in stats.collect():
        assert r.m == pytest.approx(0.0, abs=1e-9)
        assert r.s == pytest.approx(1.0, abs=1e-6)


def test_chunk_udtf(spark):
    spark.udtf.register("chunk_document", ChunkDocument)
    df = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id int, text string"
    )
    df.createOrReplaceTempView("chunk_in")
    rows = spark.sql(
        "SELECT c.* FROM chunk_in, LATERAL chunk_document(text, 3) AS c"
    ).collect()
    assert [(r.chunk_id, r.chunk, r.n_tokens) for r in rows] == [
        (0, "a b c", 3),
        (1, "d e f", 3),
        (2, "g", 1),
    ]

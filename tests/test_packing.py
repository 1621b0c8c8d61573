"""Sequence packing: budget respected, docs conserved, deterministic,
and fill efficiency in FFD's expected range on the real corpus."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafkastreamsproject_spark.functions import text as TX
from kafkastreamsproject_spark.operators.packing import pack_documents, packing_stats
from kafkastreamsproject_spark.sources.testdata import load_table

BUDGET = 512


def _doc_tokens(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).select(
        "doc_id", TX.n_bpe_tokens(F.col("text")).alias("n_tokens")
    )


def test_packing_budget_and_conservation(spark, sf_dir):
    docs = _doc_tokens(spark, sf_dir)
    n_docs = docs.count()
    packed = pack_documents(docs, BUDGET, n_shards=4)

    rows = packed.collect()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs  # each doc exactly once

    stats = packing_stats(packed, BUDGET).collect()
    for s in stats:
        if s.overflow:
            assert s.n_docs == 1  # oversize docs pack alone
            assert s.pack_tokens > BUDGET
        else:
            assert s.pack_tokens <= BUDGET
    # pack_tokens column on the per-doc rows agrees with the audit
    by_pack = {(s.shard_id, s.pack_id): s.pack_tokens for s in stats}
    for r in rows:
        assert by_pack[(r.shard_id, r.pack_id)] == r.pack_tokens


def test_packing_deterministic(spark, sf_dir):
    docs = _doc_tokens(spark, sf_dir)
    a = sorted(map(tuple, pack_documents(docs, BUDGET, n_shards=4).collect()))
    b = sorted(map(tuple, pack_documents(docs, BUDGET, n_shards=4).collect()))
    assert a == b


def test_packing_fill_efficiency(spark, sf_dir):
    """FFD wastes at most ~2/9 of OPT; with hash sharding the practical
    bound is looser but the corpus-wide fill should still clear 75%
    (excluding the inherently short tail pack of each shard)."""
    docs = _doc_tokens(spark, sf_dir).filter(F.col("n_tokens") <= BUDGET)
    packed = pack_documents(docs, BUDGET, n_shards=4)
    stats = packing_stats(packed, BUDGET)
    # drop each shard's emptiest pack (the tail that couldn't be topped up)
    w = F.row_number().over(
        Window.partitionBy("shard_id").orderBy(
            F.col("fill_ratio").asc(), F.col("pack_id").asc()
        )
    )
    body = stats.withColumn("rk", w).filter(F.col("rk") > 1)
    fill = body.agg(
        (F.sum("pack_tokens") / (F.count(F.lit(1)) * BUDGET)).alias("f")
    ).first().f
    assert fill is not None and fill >= 0.75, f"fill ratio {fill}"


def test_packing_oversize_doc_flagged(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 600), (3, 500), (4, 20)], "doc_id long, n_tokens long"
    )
    packed = pack_documents(docs, BUDGET, n_shards=1)
    rows = {r.doc_id: r for r in packed.collect()}
    assert rows[2].overflow and rows[2].pack_tokens == 600
    assert not rows[3].overflow
    # doc 3 (500) leaves 12 spare: doc 1 (10) fits, doc 4 (20) does not
    assert rows[1].pack_id == rows[3].pack_id
    assert rows[4].pack_id not in (rows[3].pack_id, rows[2].pack_id)


def test_shard_col_override_routes_and_packs(spark):
    """Caller-supplied sharding (shard_col): every row lands in its
    given shard, budget still respected per pack — the leg
    packing_ffd_replay's oracle replays with md5 shards."""
    docs = spark.createDataFrame(
        [(i, 10 + (i * 7) % 50, i % 3) for i in range(60)],
        "doc_id long, n_tokens long, s int",
    )
    packed = pack_documents(docs, 64, shard_col="s").toPandas()
    assert sorted(packed.doc_id) == list(range(60))
    assert set(packed.shard_id) == {0, 1, 2}
    # routing: shard_id equals the supplied column
    assert all(packed.shard_id == packed.doc_id % 3)
    by_pack = packed.groupby("pack_id").n_tokens.sum()
    assert (by_pack[~packed.groupby("pack_id").overflow.any()] <= 64).all()

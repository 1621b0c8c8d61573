"""Driver-visible verification of the streaming near-dup ingest path.

``streaming/neardup.py``'s verdicts are pytest-equal to the batch
MinHash family, but until round 3 the store-probe join had no
hard-signal CORRECTNESS row.  This query replays the doubled corpus
through :func:`ingest_batch` as two micro-batches — batch 1 = the
original documents, batch 2 = the shifted copies (guaranteed dups of
batch 1) — and emits the admitted-canonical set.  The DuckDB oracle
re-derives acceptance from the same confirmed-pair relation the batch
family oracles use (``_SQL_MINHASH_CTES``): a batch-1 doc is rejected
iff a lower-id batch-1 doc confirms against it; a batch-2 doc is
rejected iff an ACCEPTED batch-1 doc (the store) or a lower-id batch-2
doc confirms against it.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamsproject_spark.plans.dedup import _SHIFT, _SQL_MINHASH_CTES
from kafkastreamsproject_spark.plans.registry import register
from kafkastreamsproject_spark.sources.testdata import fan_out, load_table
from kafkastreamsproject_spark.streaming.neardup import ingest_batch


@register(
    "streaming_neardup_ingest",
    oracle=f"""
    WITH {_SQL_MINHASH_CTES},
    b1 AS (SELECT doc_id FROM sigs WHERE doc_id < {_SHIFT}),
    b2 AS (SELECT doc_id FROM sigs WHERE doc_id >= {_SHIFT}),
    rej1 AS (
      SELECT DISTINCT id_b AS doc_id FROM pairs
      WHERE id_a < {_SHIFT} AND id_b < {_SHIFT}
    ),
    acc1 AS (
      SELECT doc_id FROM b1
      WHERE doc_id NOT IN (SELECT doc_id FROM rej1)
    ),
    rej2 AS (
      -- ids only increase across batches, so a store match always has
      -- id_a in batch 1 and id_b in batch 2; a batch-internal match has
      -- both ids in batch 2 with id_a the earlier (lower) doc
      SELECT DISTINCT id_b AS doc_id FROM pairs
      WHERE id_b >= {_SHIFT}
        AND (id_a >= {_SHIFT} OR id_a IN (SELECT doc_id FROM acc1))
    ),
    acc2 AS (
      SELECT doc_id FROM b2
      WHERE doc_id NOT IN (SELECT doc_id FROM rej2)
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, 1 AS batch FROM acc1
    UNION ALL
    SELECT CAST(doc_id AS BIGINT) AS doc_id, 2 AS batch FROM acc2
    """,
    tags=("dedup", "minhash", "streaming"),
)
def streaming_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-batch replay of dedup-at-ingest: fold the original documents,
    then their shifted copies, through the persistent-signature-store
    loop; return who survived as canonical.  Exercises end-to-end: batch
    signaturing, the store-probe banded equi-join, within-batch LSH,
    Jaccard confirmation, and the store append/anti-join bookkeeping.

    The store lives in a throwaway temp dir; both ``ingest_batch`` calls
    eagerly localCheckpoint their results, so the returned DataFrame has
    no lineage into the deleted files.  The driver-local temp path is a
    single-machine (local[*]) harness choice — this query VERIFIES the
    ingest loop; a production deployment runs
    ``to_neardup_ingest_sink`` against a shared store URI (HDFS/S3),
    which the loop's Hadoop-FS probes already handle.
    """
    # fan_out: the local documents file is one row group, so without it
    # each batch's shingle+md5 signaturing serializes on one core (the
    # streaming sink doesn't need this — its micro-batches arrive
    # already partitioned by the source).
    docs = fan_out(load_table(spark, "documents", sf_dir).select("doc_id", "text"))
    shifted = docs.select((F.col("doc_id") + _SHIFT).alias("doc_id"), "text")
    store = tempfile.mkdtemp(prefix="neardup_ingest_store_")
    try:
        _, acc1 = ingest_batch(docs, store)
        _, acc2 = ingest_batch(shifted, store)
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return acc1.select("doc_id", F.lit(1).alias("batch")).unionByName(
        acc2.select("doc_id", F.lit(2).alias("batch"))
    )

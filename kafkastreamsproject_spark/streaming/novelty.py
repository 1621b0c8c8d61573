"""Incremental corpus-novelty tracking at ingest — the streaming twin
of ``plans/llmdata.py:doc_novelty_audit``.

A curation deployment wants the novelty curve AS SHARDS ARRIVE, not as
a full-corpus recompute: each batch's documents are scored against a
persistent first-seen trigram store (which trigram hashes has the
corpus already carried, and which document carried each first), then
the batch's genuinely-new hashes are admitted so the next batch dedups
novelty against them.  The same persisted-store fold as
``streaming/neardup.py:ingest_batch`` — read-only probe, verdicts
pinned pre-append with an eager localCheckpoint, idempotent anti-join
append — applied to the 8-byte trigram-hash relation instead of
MinHash signatures.

Attribution contract (matches the batch audit): a trigram belongs to
the FIRST carrier in arrival order — across batches by batch order,
within a batch by minimum doc_id.  Replaying a crashed epoch is safe:
hashes already admitted are anti-joined away, and the per-doc stats of
a replay equal the original's because the store snapshot they probe is
the same (verdicts-before-append discipline).

Scale shape: trigrams md5-hash inside the row before the explode (text
never shuffles), the store carries (h, first_doc) longs — 16 B per
distinct corpus trigram — the probe is a hash anti-join keyed on h,
and per-doc rollups shuffle (doc_id, long) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamsproject_spark.functions import hashing as H
from kafkastreamsproject_spark.functions import text as TX
from kafkastreamsproject_spark.operators.fs import hadoop_has_files

_NOVELTY_SCHEMA = "h long, first_doc long"
_TRI_W = 3


def doc_trigram_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, h) — distinct word-trigram hashes per document, hashed
    in-row (docs under the trigram width contribute nothing, the batch
    audit's documented behavior)."""
    toks = TX.tokens(F.col("text"))
    return (
        docs.filter(F.size(toks) >= _TRI_W)
        .select(
            "doc_id",
            F.explode(
                H.hash_list(TX.shingles(F.col("text"), _TRI_W))
            ).alias("h"),
        )
    )


def _read_store(spark: SparkSession, path: str) -> DataFrame:
    if hadoop_has_files(spark, path):
        return spark.read.schema(_NOVELTY_SCHEMA).parquet(path)
    return spark.createDataFrame([], _NOVELTY_SCHEMA)


def novelty_ingest_batch(
    batch: DataFrame, store_path: str
) -> DataFrame:
    """One fold of the novelty-at-ingest loop (the foreachBatch body,
    exposed for tests and backfills).

    Returns per-document stats ``(doc_id, n_trigrams, n_novel,
    novelty)`` where a trigram is novel iff it is absent from the
    store AND this doc is its minimum-doc_id carrier within the batch.
    Side effect: appends the batch's novel (h, first_doc) rows under
    ``<store>/trigrams`` (idempotent under epoch replay)."""
    spark = batch.sparkSession
    tri_path = f"{store_path}/trigrams"

    tri = doc_trigram_hashes(batch)
    tri.persist()
    store = _read_store(spark, tri_path)

    batch_first = tri.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    fresh = batch_first.join(store.select("h"), "h", "left_anti")

    stats = (
        tri.join(
            fresh.select("h", F.col("first_doc").alias("nf")), "h", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum(
                (F.col("nf") == F.col("doc_id")).cast("long")
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias(
                "n_novel"
            ),
            (
                F.coalesce(F.col("n_novel"), F.lit(0))
                / F.col("n_trigrams").cast("double")
            ).alias("novelty"),
        )
    )
    # pin stats AND the append set to the pre-append store snapshot:
    # neither carries lineage into files this fold writes
    stats = stats.localCheckpoint(eager=True)
    admitted = fresh.localCheckpoint(eager=True)
    tri.unpersist()

    admitted.write.mode("append").parquet(tri_path)
    return stats


def to_novelty_ingest_sink(
    docs: DataFrame, store_path: str, checkpoint: str, out_table: str
):
    """Streaming form: fold each micro-batch through
    :func:`novelty_ingest_batch` and collect per-doc stats into a
    global temp view (test double for a metrics sink)."""

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        stats = novelty_ingest_batch(batch_df, store_path)
        stats.createOrReplaceGlobalTempView(out_table)

    return (
        docs.writeStream.outputMode("append")
        .foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .start()
    )

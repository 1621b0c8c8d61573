"""Incremental keep-first LINE dedup at ingest — the streaming twin of
``plans/shadow.py:line_dedup_keep_first``.

A curation deployment dedups lines AS SHARDS ARRIVE: each batch's
lines are probed against a persistent first-seen line-hash store (which
line hashes has the corpus already kept a copy of), survivors are
elected keep-first WITHIN the batch by (doc_id, ordinal), and the
batch's genuinely-new hashes are admitted so the next batch dedups
against them.  Same persisted-store fold discipline as
``streaming/neardup.py:ingest_batch`` and ``streaming/novelty.py``:
read-only probe, verdicts pinned pre-append with an eager
localCheckpoint, idempotent append.

Attribution contract (matches the batch operator): a line belongs to
its FIRST keeper in arrival order — across batches by batch order,
within a batch by minimum (doc_id, ordinal).

Scale shape: lines are sliced and hashed in-row (text never shuffles);
the store carries one 32-char md5 per distinct corpus line; the probe
is a hash anti-join; per-doc rollups shuffle (doc_id, small ints).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafkastreamsproject_spark.functions import text as TX
from kafkastreamsproject_spark.operators.fs import hadoop_has_files

LINE_W = 12  # tokens per synthetic line — must match the batch operator
_STORE_SCHEMA = "lh string"


def lines_expr(toks: Column, w: int = LINE_W) -> Column:
    """``array<string>`` of consecutive ``w``-token lines (row-major,
    tail partial line included) over a token-array column — the shared
    line construction of the batch and ingest operators."""
    n_last = ((F.size(toks) - 1) / w).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_last),
        lambda i: F.array_join(F.slice(toks, i * w + 1, w), " "),
    )


def _read_store(spark: SparkSession, path: str) -> DataFrame:
    if hadoop_has_files(spark, path):
        return spark.read.schema(_STORE_SCHEMA).parquet(path)
    return spark.createDataFrame([], _STORE_SCHEMA)


def line_dedup_ingest_batch(batch: DataFrame, store_path: str) -> DataFrame:
    """One fold of the line-dedup-at-ingest loop (the foreachBatch
    body, exposed for tests and backfills).

    Returns per-document stats ``(doc_id, n_lines, n_kept, kept_ords,
    keep_frac)`` where a line is kept iff its hash is absent from the
    store AND this (doc_id, ordinal) is its minimum keeper within the
    batch.  Side effect: appends the batch's fresh line hashes under
    ``<store>/lines`` (idempotent under epoch replay: already-admitted
    hashes anti-join away)."""
    spark = batch.sparkSession
    path = f"{store_path}/lines"

    toks = TX.tokens(F.col("text"))
    base = batch.filter(F.size(toks) >= 1).select(
        "doc_id", lines_expr(toks).alias("lines")
    )
    ex = base.select(
        "doc_id", F.posexplode(F.transform("lines", F.md5)).alias("ord", "lh")
    )
    ex.persist()
    store = _read_store(spark, path)

    batch_first = ex.groupBy("lh").agg(
        F.min(F.struct("doc_id", "ord")).alias("w")
    )
    fresh = batch_first.join(store.select("lh"), "lh", "left_anti")
    kept = (
        ex.join(fresh, "lh")
        .filter(
            (F.col("doc_id") == F.col("w.doc_id"))
            & (F.col("ord") == F.col("w.ord"))
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("ord")).alias("keep"))
    )
    stats = (
        base.select("doc_id", F.size("lines").alias("n_lines"))
        .join(kept, "doc_id", "left")
        .withColumn("keep", F.coalesce("keep", F.array().cast("array<int>")))
        .select(
            "doc_id",
            "n_lines",
            F.size("keep").alias("n_kept"),
            F.array_join(F.col("keep").cast("array<string>"), ",").alias(
                "kept_ords"
            ),
            (F.size("keep") / F.col("n_lines").cast("double")).alias(
                "keep_frac"
            ),
        )
    )
    # pin stats AND the append set to the pre-append store snapshot:
    # neither carries lineage into files this fold writes
    stats = stats.localCheckpoint(eager=True)
    admitted = fresh.select("lh").localCheckpoint(eager=True)
    ex.unpersist()

    admitted.write.mode("append").parquet(path)
    return stats


def to_line_dedup_ingest_sink(
    docs: DataFrame, store_path: str, checkpoint: str, out_table: str
):
    """Streaming form: fold each micro-batch through
    :func:`line_dedup_ingest_batch` and surface per-doc stats in a
    global temp view (test double for a metrics sink)."""

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        stats = line_dedup_ingest_batch(batch_df, store_path)
        stats.createOrReplaceGlobalTempView(out_table)

    return (
        docs.writeStream.outputMode("append")
        .foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .start()
    )
